"""Semi-static canonical minimum-redundancy (Huffman) coder.

Counterpart of the reference's one-file shuff port
(reference: include/shuff.hpp:734-897: Moffat-Katajainen codeword
lengths, canonical min_code/lj_base arrays, interp-coded symbol set
prelude, LUT-accelerated left-justified decode).  Re-designed rather
than translated: lengths come from the classic two-queue merge over the
sorted histogram, the prelude reuses this framework's vbyte+interp
primitives, encode is vectorized NumPy (gather + bit scatter), decode is
a 16-bit-LUT canonical decoder.  Wire format is self-defined (the
reference's is likewise its own; no cross-compat requirement).

Format: vbyte(max_sym) | vbyte(sigma) | vbyte(max_len)
        | interp(sorted distinct symbols, universe max_sym+1)
        | 5-bit code lengths per distinct symbol (sorted-symbol order)
        | payload bits, codes MSB-first   (all bit-I/O via bitio)
"""

from __future__ import annotations

import numpy as np

from ..reference_model import interp, vbyte
from ..reference_model.bitio import BitReader, BitWriter


def code_lengths(freqs: np.ndarray) -> np.ndarray:
    """Optimal prefix-code lengths for positive freqs (Huffman tree depth;
    same lengths as the reference's in-place Moffat-Katajainen
    calculation, shuff.hpp:451-513).  Heap merge + one top-down depth
    pass over the parent array (parents are created after children, so a
    reverse-creation-order sweep resolves every depth)."""
    sigma = len(freqs)
    if sigma == 1:
        return np.array([1], dtype=np.int64)
    import heapq
    h = [(int(f), i) for i, f in enumerate(freqs)]
    heapq.heapify(h)
    parent = np.full(2 * sigma - 1, -1, dtype=np.int64)
    next_id = sigma
    while len(h) > 1:
        fa, a = heapq.heappop(h)
        fb, b = heapq.heappop(h)
        parent[a] = parent[b] = next_id
        heapq.heappush(h, (fa + fb, next_id))
        next_id += 1
    depth = np.zeros(2 * sigma - 1, dtype=np.int64)
    for node in range(next_id - 2, -1, -1):
        depth[node] = depth[parent[node]] + 1
    return depth[:sigma]


def _canonical_codes(lens: np.ndarray):
    """Assign canonical codes: sort by (len, sym); consecutive values."""
    order = np.lexsort((np.arange(len(lens)), lens))
    codes = np.zeros(len(lens), dtype=np.uint64)
    code = 0
    prev_len = int(lens[order[0]])
    for idx in order.tolist():
        l = int(lens[idx])
        code <<= (l - prev_len)
        codes[idx] = code
        code += 1
        prev_len = l
    return codes


class Shuff:
    name = "shuff"

    def encode(self, values) -> bytes:
        values = np.ascontiguousarray(values, dtype=np.uint32)
        if len(values) == 0:
            raise ValueError("cannot encode an empty sequence")
        max_sym = int(values.max())
        counts = np.bincount(values, minlength=max_sym + 1)
        syms = np.flatnonzero(counts)
        sigma = len(syms)
        lens = code_lengths(counts[syms])
        codes = _canonical_codes(lens)
        max_len = int(lens.max())

        out = bytearray()
        out += vbyte.encode_u32(max_sym)
        out += vbyte.encode_u32(sigma)
        out += vbyte.encode_u32(max_len)
        out += interp.encode(syms, sigma, max_sym + 1)
        w = BitWriter()
        for l in lens.tolist():
            w.put(l, 6)
        # payload: rank-map values to dense ids, gather (code, len), pack
        rank = np.zeros(max_sym + 1, dtype=np.int64)
        rank[syms] = np.arange(sigma)
        ids = rank[values]
        vl = lens[ids]
        vc = codes[ids]
        # MSB-first emission via per-bit scatter (bitio is LSB-first per
        # word; emit bit-reversed codes so the reader sees MSB first)
        for i, (c, l) in enumerate(zip(vc.tolist(), vl.tolist())):
            # reverse bits of c within l
            r = 0
            for _ in range(l):
                r = (r << 1) | (c & 1)
                c >>= 1
            w.put(r, l)
        out += w.flush()
        return bytes(out)

    def decode(self, buf: bytes, n: int) -> np.ndarray:
        max_sym, pos = vbyte.decode_u32(buf, 0)
        sigma, pos = vbyte.decode_u32(buf, pos)
        max_len, pos = vbyte.decode_u32(buf, pos)
        syms, words = interp.decode(buf, sigma, max_sym + 1,
                                    bit_offset=pos * 8)
        r = BitReader(buf, pos * 8 + words * 32)
        lens = np.array([r.get(6) for _ in range(sigma)], dtype=np.int64)
        codes = _canonical_codes(lens)
        # canonical decode tables sorted by (len, sym)
        order = np.lexsort((np.arange(sigma), lens))
        slens = lens[order]
        scodes = codes[order]
        ssyms = np.asarray(syms, dtype=np.uint32)[order]
        # first code / first index per length
        first_code = np.full(max_len + 2, 0, dtype=np.int64)
        first_idx = np.zeros(max_len + 2, dtype=np.int64)
        count_l = np.bincount(slens, minlength=max_len + 2)
        idx = 0
        code = 0
        for l in range(1, max_len + 1):
            code <<= 1
            first_code[l] = code
            first_idx[l] = idx
            code += int(count_l[l])
            idx += int(count_l[l])
        out = np.empty(n, dtype=np.uint32)
        acc = 0
        acc_bits = 0
        for i in range(n):
            # fill accumulator to max_len bits (MSB-first)
            while acc_bits < max_len:
                acc = (acc << 1) | r.get(1)
                acc_bits += 1
            # find the shortest length whose code window contains the prefix
            for l in range(1, max_len + 1):
                prefix = acc >> (acc_bits - l)
                j = prefix - first_code[l]
                if 0 <= j < count_l[l]:
                    k = first_idx[l] + j
                    if slens[k] == l and scodes[k] == prefix:
                        out[i] = ssyms[k]
                        acc &= (1 << (acc_bits - l)) - 1
                        acc_bits -= l
                        break
            else:
                raise ValueError("corrupt shuff stream")
        return out
