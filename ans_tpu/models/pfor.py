"""OptPFor-style patched frame-of-reference codec.

Counterpart of the reference's FastPFor OPTPFor<128> + VariableByte
composite (reference: include/methods.hpp:61-87).  Re-designed, not a
port of FastPFor: per 128-int block, every bit width b is costed exactly
(payload 128*b bits + exception list of positions and overflow high
bits) and the cheapest is chosen — the "Opt" in OptPFor.  Wire format is
self-defined; the tail (n mod 128) is vbyte-coded like the reference's
VariableByte composite stage.

Block layout: u8 b | u8 n_exc | n_exc * u8 positions
              | n_exc * vbyte(value >> b) | ceil(128*b/8) payload bytes
"""

from __future__ import annotations

import numpy as np

from ..reference_model import vbyte

BLOCK = 128


def _pack_bits(vals: np.ndarray, b: int) -> bytes:
    """Pack BLOCK values of b bits each, LSB-first per value."""
    if b == 0:
        return b""
    bits = ((vals[:, None] >> np.arange(b, dtype=np.uint32)) & 1).astype(
        np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def _unpack_bits(buf: bytes, b: int) -> np.ndarray:
    if b == 0:
        return np.zeros(BLOCK, dtype=np.uint32)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8),
                         count=BLOCK * b, bitorder="little")
    bits = bits.reshape(BLOCK, b).astype(np.uint32)
    return (bits << np.arange(b, dtype=np.uint32)).sum(
        axis=1, dtype=np.uint32)


def _best_width(vals: np.ndarray) -> int:
    nbits = np.zeros(BLOCK, dtype=np.int64)
    nz = vals > 0
    nbits[nz] = np.floor(np.log2(vals[nz].astype(np.float64))).astype(
        np.int64) + 1
    best_b, best_cost = 32, 1 << 60
    over_bytes = np.maximum(0, -(-(nbits[:, None]
                                   - np.arange(33)) // 7))
    for b in range(33):
        exc = nbits > b
        n_exc = int(exc.sum())
        if n_exc > 255:
            continue
        cost = 2 + n_exc + int(over_bytes[exc, b].sum()) + (BLOCK * b + 7) // 8
        if cost < best_cost:
            best_cost, best_b = cost, b
    return best_b


class OptPFor:
    name = "OptPFor"

    def encode(self, values) -> bytes:
        values = np.ascontiguousarray(values, dtype=np.uint32)
        if len(values) == 0:
            raise ValueError("cannot encode an empty sequence")
        n = len(values)
        out = bytearray()
        nb = n // BLOCK
        for i in range(nb):
            blk = values[i * BLOCK:(i + 1) * BLOCK]
            b = _best_width(blk)
            mask = np.uint32((1 << b) - 1) if b < 32 else np.uint32(-1)
            low = blk & mask
            exc_pos = np.flatnonzero((blk >> np.uint32(b)) > 0) if b < 32 \
                else np.array([], dtype=np.int64)
            out.append(b)
            out.append(len(exc_pos))
            out += bytes(exc_pos.astype(np.uint8).tolist())
            for p in exc_pos.tolist():
                out += vbyte.encode_u32(int(blk[p]) >> b)
            out += _pack_bits(low, b)
        for v in values[nb * BLOCK:].tolist():
            out += vbyte.encode_u32(v)
        return bytes(out)

    def decode(self, buf: bytes, n: int) -> np.ndarray:
        out = np.empty(n, dtype=np.uint32)
        pos = 0
        nb = n // BLOCK
        for i in range(nb):
            b = buf[pos]
            n_exc = buf[pos + 1]
            pos += 2
            exc_pos = np.frombuffer(buf, dtype=np.uint8, count=n_exc,
                                    offset=pos)
            pos += n_exc
            highs = np.empty(n_exc, dtype=np.uint32)
            for j in range(n_exc):
                h, pos = vbyte.decode_u32(buf, pos)
                highs[j] = h
            nbytes = (BLOCK * b + 7) // 8
            vals = _unpack_bits(buf[pos:pos + nbytes], b)
            pos += nbytes
            if n_exc:
                vals[exc_pos] |= highs << np.uint32(b)
            out[i * BLOCK:(i + 1) * BLOCK] = vals
        for i in range(nb * BLOCK, n):
            v, pos = vbyte.decode_u32(buf, pos)
            out[i] = v
        return out
