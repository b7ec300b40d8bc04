"""Pseudo-adaptive block-based ANS (paper Figure 13).

Counterpart of reference src/pseudo_adaptive.cpp:64-177: the input is cut
into fixed-size blocks; each block stores its own dense alphabet
(interp-coded sorted symbol set + universe) and rank-remaps its symbols
before ANS coding, so block models adapt to local statistics.  The
reference is encode-only (SURVEY.md section 2.5: "no block decoder exists
in the repo"); this implementation adds the decoder, making the mode a
real codec.  Single-symbol blocks skip entropy coding entirely
(pseudo_adaptive.cpp:120).

Container: u32 magic "ATFP" | u8 ver | u8 kind(0=int,1=msb)
           | u8 engine(0=compat,1=lane; ver>=2) | u8 rsvd
           | u32 n | u32 block_size
per block: u32 blob_len | vbyte(sigma_b) |
           sigma_b == 1 ? vbyte(symbol)
                        : vbyte(max_sym_b) | interp(alphabet) | ANS blob
"""

from __future__ import annotations

import struct

import numpy as np

from ..reference_model import interp, vbyte
from . import ans as lane_ans

MAGIC = 0x41544650  # "PFTA" LE -> "ATFP"


class PseudoAdaptive:
    """Block codec with per-block alphabets and models."""

    def __init__(self, block_size: int = 128 * 1024, kind: str = "int",
                 lanes: int | None = None, engine: str = "auto"):
        assert kind in ("int", "msb")
        self.block_size = block_size
        self.kind = kind
        self.lanes = lanes
        self.engine = engine
        self.name = f"pseudo_adaptive-{kind}-{block_size}"

    def _resolve_engine(self, block_size: int) -> str:
        if self.engine != "auto":
            return self.engine
        # small blocks: per-block jit dispatch costs more than the
        # native/compat host coder; large blocks: lane engine
        return "lane" if block_size >= (1 << 16) else "compat"

    def _codec(self, kind: str, engine: str):
        """Per-block codec.  decode() passes the HEADER's kind and
        engine — the two wire-format facts — so any instance decodes
        any ATFP container."""
        if engine == "compat":
            from ..reference_model import rans_compat
            return (rans_compat.AnsInt() if kind == "int"
                    else rans_compat.AnsMsb())
        if kind == "int":
            return lane_ans.AnsInt(lanes=self.lanes)
        return lane_ans.AnsMsb(lanes=self.lanes)

    def encode(self, values) -> bytes:
        values = np.ascontiguousarray(values, dtype=np.uint32)
        if len(values) == 0:
            raise ValueError("cannot encode an empty sequence")
        engine = self._resolve_engine(self.block_size)
        out = bytearray()
        out += struct.pack("<IBBBBII", MAGIC, 2,
                           0 if self.kind == "int" else 1,
                           0 if engine == "compat" else 1, 0,
                           len(values), self.block_size)
        codec = self._codec(self.kind, engine)
        for off in range(0, len(values), self.block_size):
            block = values[off:off + self.block_size]
            alpha = np.unique(block)
            blob = bytearray()
            blob += vbyte.encode_u32(len(alpha))
            if len(alpha) == 1:
                blob += vbyte.encode_u32(int(alpha[0]))
            else:
                # dense rank remap (pseudo_adaptive.cpp:103-105) and
                # interp-coded alphabet (:111-118)
                max_sym = int(alpha[-1])
                blob += vbyte.encode_u32(max_sym)
                blob += interp.encode(alpha, len(alpha), max_sym + 1)
                remapped = np.searchsorted(alpha, block).astype(np.uint32)
                blob += codec.encode(remapped)
            out += struct.pack("<I", len(blob))
            out += blob
        return bytes(out)

    def decode(self, blob: bytes, n: int | None = None) -> np.ndarray:
        magic, ver, kind_id, eng_id, _, n_stored, bs = struct.unpack_from(
            "<IBBBBII", blob, 0)
        if magic != MAGIC:
            raise ValueError("not an ATFP container")
        n = n_stored if n is None else n
        kind = "int" if kind_id == 0 else "msb"
        # ver 1 containers did not record the engine; reconstruct it
        # from the auto rule over the stored block size
        engine = (("compat", "lane")[eng_id] if ver >= 2
                  else ("lane" if bs >= (1 << 16) else "compat"))
        codec = self._codec(kind, engine)
        out = np.empty(n, dtype=np.uint32)
        pos = 16
        off = 0
        while off < n:
            blen = min(bs, n - off)
            (clen,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            body = blob[pos:pos + clen + 8]   # +8: interp may overread
            sigma, p = vbyte.decode_u32(body, 0)
            if sigma == 1:
                sym, p = vbyte.decode_u32(body, p)
                out[off:off + blen] = sym
            else:
                max_sym, p = vbyte.decode_u32(body, p)
                alpha, words = interp.decode(body, sigma, max_sym + 1,
                                             bit_offset=p * 8)
                # the stream slice must END exactly at the block boundary
                # (the compat engine anchors its final states there)
                remapped = codec.decode(blob[pos + p + words * 4:
                                             pos + clen], blen)
                out[off:off + blen] = np.asarray(alpha, dtype=np.uint32)[
                    remapped]
            pos += clen
            off += blen
        return out
