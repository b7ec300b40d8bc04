"""Pallas TPU decode kernel for the lockstep S-lane rANS format (fmt 2).

The XLA scan engine (lane_codec.decode_lanes) round-trips lane state
through HBM every step; this kernel keeps all S states, the cursor, the
decode table and the current stream section resident in VMEM for the
full T-step loop — the TPU-native equivalent of the reference's
register-resident 4-state loop (reference: ans_fold.hpp:283-310), scaled
to S lanes on the VPU.

Mosaic's vector gather support is limited to lane-dim shuffles
(`take_along_axis` axis=1, indices < 128), so every random access is
decomposed as hi/lo = idx >> 7 / idx & 127 and materialized as one lane
shuffle + masked term per 128-entry row, combined by a balanced OR tree
— the format was designed so all such accesses are small:

  * decode-table lookups: 2 per step (freq<<16|offset and the packed
    high/nb word), each M/128 rows;
  * stream reads: one gather PER ROUND-CHANNEL from that channel's own
    <= (512 + S)-byte window (split_win; the round bases are
    lane-uniform scalars) — scanning 6 rows per channel instead of the
    22-row worst-case union window took the v5e headline 450 -> 542M.

Scalar-unit traffic is minimized — measurement showed per-step scalar
round-trips (SMEM cursor, vector->scalar extractions) dominating the
skeleton cost — so the cursor lives in vector form, all six round masks
are computed before any byte is read (the format guarantees this is
possible), their ranks come from one batched (6R, 128) prefix sum, and
the only scalar extraction per step is the window slice row.

All arithmetic runs in i32; fmt 2 invariants keep every value below
2^31, so signed compares and shifts are exact.  Final values are
bitcast to u32.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grouped import PRANK_MASK as _PRANK_MASK
from .grouped import PRANK_SHIFT_BITS as _PRANK_SHIFT_BITS
from .tables import A_L, max_renorm_rounds


def _lookup(rows, idx, Mr, B):
    """rows: (Mr, 128) i32 table; idx: (B, 128) i32 in [0, Mr*128).
    One lane shuffle + mask per row, combined by a balanced OR tree
    (log depth, so the row loop pipelines)."""
    lo = idx & 127
    hi = idx >> 7
    terms = []
    for h in range(Mr):
        row = jnp.broadcast_to(rows[h:h + 1, :], (B, 128))
        y = jnp.take_along_axis(row, lo, axis=1)
        terms.append(jnp.where(hi == h, y, 0))
    while len(terms) > 1:
        nxt = [a | b for a, b in zip(terms[::2], terms[1::2])]
        if len(terms) & 1:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def rowmm_mask(R, C):
    """Loop-invariant segmented lower-triangular mask for the row-pass
    matmul of _prefixc: mask[b, b'] = (b' <= b) within one channel.
    Build this ONCE before the step loop — the round-2 experiment that
    built it per step measured 4% SLOWER than the roll rounds; hoisted,
    the row pass becomes one (B,B)@(B,128) MXU op per step."""
    B = C * R
    rb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    cb = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    lg = R.bit_length() - 1  # R = S/128 is a power of two
    return ((cb <= rb)
            & (jax.lax.shift_right_logical(cb, lg)
               == jax.lax.shift_right_logical(rb, lg))).astype(
        jnp.float32)


def _prefixc(m6, R, C, rowmask=None):
    """Batched exclusive prefix sums of C (R,128) masks stacked as
    (C*R, 128), each in lane-major order within its own channel.
    Returns (exclusive ranks (C*R,128), per-channel totals (C, 128)).

    The lane-dim inclusive prefix is ONE upper-triangular f32 matmul on
    the MXU instead of 7 roll+where rounds on the VPU (+4-5% on the
    decode headline, more on the placement kernel whose prefix spans
    G*CH*R rows).  Exact: per-lane values here are byte counts <= 8,
    so lane sums <= 1024 << 2^24.

    rowmask: precomputed rowmm_mask(R, C) — the row pass then runs as
    one (B,B)@(B,128) MXU matmul instead of log2(R) roll rounds
    (exact: row sums <= B*1024 < 2^24)."""
    B = C * R
    r128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    c128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (r128 <= c128).astype(jnp.float32)
    incf = jnp.dot(m6.astype(jnp.float32), tri,
                   preferred_element_type=jnp.float32)
    inc = incf.astype(jnp.int32)
    row_tot = jnp.broadcast_to(inc[:, 127:128], (B, 128))
    if R == 1:
        return inc - m6, row_tot              # (C, 128) when R == 1
    if rowmask is not None:
        rinc = jnp.dot(rowmask,
                       jnp.broadcast_to(incf[:, 127:128], (B, 128)),
                       preferred_element_type=jnp.float32).astype(
            jnp.int32)
    else:
        row = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
        sub = row % R  # row index within channel
        rinc = row_tot
        d = 1
        while d < R:
            rinc = rinc + jnp.where(sub >= d,
                                    pltpu.roll(rinc, d, axis=0), 0)
            d *= 2
    excl_row = rinc - row_tot
    chan_tot = jnp.concatenate(
        [rinc[c * R + R - 1:c * R + R] for c in range(C)],
        axis=0)                               # (C, 128), lane-uniform
    return (inc - m6) + excl_row, chan_tot


def _prefix6(m6, R):
    return _prefixc(m6, R, 6)


def _take1(row, idx, B):
    """Single-row lane-shuffle lookup (caller guarantees idx < 128)."""
    return jnp.take_along_axis(jnp.broadcast_to(row, (B, 128)), idx,
                               axis=1)


def _read_merge(stream_ref, cursor, st0, ms, R, NR, NE, WR,
                split_win=False, rowmask=None):
    """Shared per-step stream machinery: batched rank prefix over the
    NR+NE round masks, the window gather(s), then the high-first
    merges.

    ms: list of NR renorm masks + NE exception masks, each (R,128) i32.
    Returns (st after renorm refills, exception low bytes, step_tot).

    split_win=False: ONE gather over the worst-case (NR+NE)S-byte
    window (WR rows scanned for every position).  split_win=True: one
    gather PER CHANNEL over that channel's own <= S-byte span (6 rows
    at S=2048 instead of 22) — channel c's positions all lie in
    [cursor + base_c, cursor + base_c + S], and base_c is lane-uniform,
    so the slice row is a scalar.  Costs CH-1 extra vector->scalar
    extractions per step; measured 450 -> 542M ints/s on the v5e
    headline (zipf n=2^25, fold-2, S=2048, CH=5), so it is the
    production default.  Buffer safety: per-channel reads end at
    (cursor + base_c) + WRc*512 <= sec_len + WR*512 because
    WRc <= WR for every CH >= 1 — the staged slack covers both
    paths."""
    CH = NR + NE
    m6 = jnp.concatenate(ms, axis=0)                    # (CH*R,128)
    rank, chan_tot = _prefixc(m6, R, CH, rowmask)
    bases_l = [jnp.zeros((1, 128), jnp.int32)]
    for c in range(CH):
        bases_l.append(bases_l[-1] + chan_tot[c:c + 1])
    step_tot = bases_l[-1]                              # (1,128)
    if split_win:
        WRc = -(-(512 + R * 128) // 512) + 1
        byte6 = []
        cur0 = cursor[0, 0]
        for c in range(CH):
            pos0 = cur0 + (jnp.int32(0) if c == 0
                           else bases_l[c][0, 0])
            r0c = pos0 >> 9
            winc = stream_ref[0, pl.ds(r0c, WRc), :]
            bpos = (cursor + bases_l[c] - (r0c << 9)
                    + rank[c * R:(c + 1) * R])          # (R,128)
            w = _lookup(winc, bpos >> 2, WRc, R)
            byte6.append((w >> ((bpos & 3) * 8)) & 0xFF)
        byte6 = jnp.concatenate(byte6, axis=0)
    else:
        bases = jnp.concatenate(bases_l[:-1], axis=0)   # (CH,128)
        # one window slice per step; the only scalar extraction
        row0 = cursor[0, 0] >> 9
        win = stream_ref[0, pl.ds(row0, WR), :]
        base_in_win = cursor - (row0 << 9)                  # (1,128)
        byte_pos = (base_in_win + rank
                    + jnp.repeat(bases, R, axis=0))        # (CH*R,128)
        q = byte_pos >> 2
        w = _lookup(win, q, WR, CH * R)
        byte6 = (w >> ((byte_pos & 3) * 8)) & 0xFF
    # merge: renorm rounds high-first, then exception bytes
    st = st0
    for j in range(NR):
        st = jnp.where(ms[j] > 0,
                       (st << 8) | byte6[j * R:(j + 1) * R], st)
    low = jnp.zeros((R, 128), jnp.int32)
    for j in range(NE):
        c = NR + j
        low = jnp.where(ms[c] > 0,
                        (low << 8) | byte6[c * R:(c + 1) * R], low)
    return st, low, step_tot


def _kernel(states_ref, n_ref, stream_ref, w1_ref, w2_ref, w3_ref,
            out_ref, state_scr, cur_scr, *, S, R, TC, T_SEC, Mr, WR,
            log2m, has_exc, packed23, NR, NE, split_win, rowmm=False):
    sec = pl.program_id(0)
    tc = pl.program_id(1)
    mask = (1 << log2m) - 1
    L = A_L

    @pl.when((sec == 0) & (tc == 0))
    def _init():
        state_scr[:] = states_ref[:]

    @pl.when(tc == 0)
    def _new_section():
        cur_scr[:] = jnp.zeros((1, 128), jnp.int32)

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    n_val = n_ref[0, 0]
    # big frames keep the slot tables as REFS and scan them through the
    # bounded-stack fori_loop (_lookup_multi_loop): the unrolled scan's
    # kernel stack grows with Mr and OOMed at Mr = 512, R = 32
    big_m = Mr > _PLANE_LOOP_MIN_ROWS
    w1 = w1_ref if big_m else w1_ref[:]
    w2 = w2_ref if big_m else w2_ref[:]
    w3 = ((w3_ref if big_m else w3_ref[:])
          if (has_exc and not packed23) else None)
    lookup_multi = _lookup_multi_loop if big_m else _lookup_multi
    rmask = rowmm_mask(R, NR + NE) if (rowmm and R > 1) else None

    def step(i, carry):
        state, cursor = carry            # (R,128) i32, (1,128) i32
        t = sec * T_SEC + tc * TC + i
        valid = (t * S + lane_global) < n_val
        slot = state & mask
        # w1/w2(/w3) are all read at the same slot: one fused pass
        # shares the idx decomposition and the Mr row compares
        if has_exc and not packed23:
            word1, w23, w3v = lookup_multi((w1, w2, w3), slot, Mr, R)
        else:
            word1, w23 = lookup_multi((w1, w2), slot, Mr, R)
        f = jax.lax.shift_right_logical(word1, 16)
        off = word1 & 0xFFFF
        st0 = f * jax.lax.shift_right_logical(state, log2m) + off
        st0 = jnp.where(valid, st0, state)
        # round masks before any read (format invariant); statically
        # empty rounds are skipped: M <= 2^16 bounds renorm reads at 2
        # (NR), the table's max nb bounds exception reads (NE)
        ms = [(valid & (st0 < (L >> (8 * j)))).astype(jnp.int32)
              for j in range(NR)]
        if has_exc:
            if packed23:
                nb = jnp.where(valid, w23 & 3, 0)
            else:
                nb = jnp.where(valid, w3v, 0)
            ms += [(nb > j).astype(jnp.int32) for j in range(NE)]
        st, low, step_tot = _read_merge(stream_ref, cursor, st0, ms,
                                        R, NR, NE, WR,
                                        split_win=split_win,
                                        rowmask=rmask)
        if has_exc:
            if packed23:
                high = jnp.where(
                    nb == 0, jax.lax.shift_right_logical(w23, 2),
                    w23 & ~jnp.int32(3))
            else:
                high = w23
            val = high + low
        else:
            val = w23
        out_ref[0, pl.ds(i, 1)] = pltpu.bitcast(val, jnp.uint32)[None]
        return st, cursor + step_tot

    st, cur = jax.lax.fori_loop(
        0, TC, step, (state_scr[:], cur_scr[:]))
    state_scr[:] = st
    cur_scr[:] = cur


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "T_SEC", "NSEC", "Mr",
                                    "WR", "SWr", "log2m", "has_exc",
                                    "packed23", "NR", "NE", "split_win",
                                    "rowmm", "interpret"))
def _call(stream3d, states2d, n, w1, w2, w3, *, S, R, TC, T_SEC, NSEC, Mr,
          WR, SWr, log2m, has_exc, packed23=False, NR=3, NE=3,
          split_win=False, rowmm=False, interpret=False):
    num_tc = T_SEC // TC
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, R=R, TC=TC, T_SEC=T_SEC, Mr=Mr,
                          WR=WR, log2m=log2m, has_exc=has_exc,
                          packed23=packed23, NR=NR, NE=NE,
                          split_win=split_win, rowmm=rowmm),
        grid=(NSEC, num_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # states
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec((1, SWr, 128), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),          # stream words
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w3
        ],
        out_specs=pl.BlockSpec((1, TC, R, 128),
                               lambda s, t: (s, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSEC, T_SEC, R, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(states2d, jnp.asarray([[n]], jnp.int32), stream3d, w1, w2, w3)
    return out.reshape(NSEC * T_SEC, S)


def _pad_rows(arr_i32: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, 128), dtype=np.int32)
    flat = arr_i32.reshape(-1)
    out.reshape(-1)[: len(flat)] = flat
    return out


def _rowmm_env() -> bool:
    """ANS_TPU_ROWMM=1: the rank-prefix ROW pass as one hoisted-mask
    (B,B)@(B,128) MXU matmul instead of log2(R) roll rounds — the r2
    ablation put the prefix chain at 26% of the decode step; measure
    head-to-head before making it the default.  '0'/'' mean OFF."""
    return os.environ.get("ANS_TPU_ROWMM", "0") not in ("", "0")


def _stage_stream(payload: np.ndarray, sec_len, WR: int,
                  sw_bytes: int | None):
    """Stack stream sections into one (nsec, SWr, 128) i32 buffer with
    WR*512 bytes of slack per section (the window gathers may read past
    a section's last byte).  sw_bytes overrides the per-section buffer
    size (block_runtime passes the mesh-wide max so every device shares
    one static shape)."""
    sec_len = np.asarray(sec_len, dtype=np.int64)
    nsec = len(sec_len)
    if sw_bytes is None:
        sw_bytes = int(sec_len.max()) + WR * 512
        sw_bytes = -(-sw_bytes // (128 * 1024)) * (128 * 1024)
    mat = np.zeros((nsec, sw_bytes), dtype=np.uint8)
    off = 0
    for s in range(nsec):
        mat[s, : sec_len[s]] = payload[off:off + sec_len[s]]
        off += int(sec_len[s])
    return mat.view("<i4").reshape(nsec, -1, 128)


# --------------------------------------------------------------------------
# pivot-search kernel: slot -> symbol by bitwise binary search
# --------------------------------------------------------------------------
#
# The direct kernel's per-step cost is two _lookup calls over M/128 table
# rows — it scales with the FRAME, so honest (uncapped) adjust_freqs
# frames are slow and ans_int's large frames are unusable.  This variant
# finds the owning symbol by a bitwise binary search over the cumulative
# bases of the PRESENT symbols (tables.SearchTable): level k probes
# base[idx | 2^k] — the 2^(d-1-k) candidate pivots of a level live in
# their own small array, so each probe is a bounded lane-shuffle lookup.
# Tracking the bracketing base values during the search yields
# freq = ub - lb and offset = slot - lb for free; only high/nb (fold/msb)
# or the raw value (sparse ans_int) needs one per-symbol lookup.  Cost
# scales with sigma (live alphabet), NOT with M — so frames can be the
# reference's exact sizes (reference: ans_int.hpp:106-161 splits decode
# entries by table size for the same reason; here the table is gone).


def _kernel_search(states_ref, n_ref, stream_ref, w2_ref, w3_ref, *rest,
                   S, R, TC, T_SEC, Sr, WR, log2m, M, depth, has_exc,
                   val_table, packed23, NR, NE, prows, ppack, w2pack,
                   split_win, rowmm=False):
    piv_refs = rest[:depth]
    out_ref = rest[depth]
    state_scr, cur_scr = rest[depth + 1], rest[depth + 2]
    sec = pl.program_id(0)
    tc = pl.program_id(1)
    mask = (1 << log2m) - 1
    L = A_L

    @pl.when((sec == 0) & (tc == 0))
    def _init():
        state_scr[:] = states_ref[:]

    @pl.when(tc == 0)
    def _new_section():
        cur_scr[:] = jnp.zeros((1, 128), jnp.int32)

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    n_val = n_ref[0, 0]
    w2 = w2_ref[:]
    w3 = w3_ref[:] if (has_exc and not packed23) else None
    pivs = [p[:] for p in piv_refs]
    rmask = rowmm_mask(R, NR + NE) if (rowmm and R > 1) else None

    def step(i, carry):
        state, cursor = carry            # (R,128) i32, (1,128) i32
        t = sec * T_SEC + tc * TC + i
        valid = (t * S + lane_global) < n_val
        slot = state & mask
        # search: m doubles in a running-rank form (m = idx >> (k+1)
        # before level k), so the pivot index is m itself at every level
        m = jnp.zeros((R, 128), jnp.int32)
        lb = jnp.zeros((R, 128), jnp.int32)
        ub = jnp.full((R, 128), M, jnp.int32)
        for k in range(depth - 1, -1, -1):
            # u16-paired pivot rows halve the deep levels' shuffle count
            idx = jax.lax.shift_right_logical(m, 1) if ppack[k] else m
            if prows[k] == 1:
                pv = _take1(pivs[k], idx, R)
            else:
                pv = _lookup(pivs[k], idx, prows[k], R)
            if ppack[k]:
                pv = jax.lax.shift_right_logical(
                    pv, (m & 1) << 4) & 0xFFFF
            take = slot >= pv
            m = m + m + take.astype(jnp.int32)
            lb = jnp.where(take, pv, lb)
            ub = jnp.where(take, ub, pv)
        f = ub - lb
        st0 = f * jax.lax.shift_right_logical(state, log2m) + (slot - lb)
        st0 = jnp.where(valid, st0, state)
        ms = [(valid & (st0 < (L >> (8 * j)))).astype(jnp.int32)
              for j in range(NR)]
        unpacked_exc = has_exc and not packed23  # w3 read alongside w2
        if has_exc or val_table:
            if w2pack:
                w23 = _lookup(w2, jax.lax.shift_right_logical(m, 1),
                              Sr, R)
                w23 = jax.lax.shift_right_logical(
                    w23, (m & 1) << 4) & 0xFFFF
            elif unpacked_exc:
                # w2 and w3 share the index m: fuse the two passes
                w23, w3v = _lookup_multi((w2, w3), m, Sr, R)
            else:
                w23 = _lookup(w2, m, Sr, R)
        if has_exc:
            if packed23:
                nb = jnp.where(valid, w23 & 3, 0)
            elif w2pack:
                nb = jnp.where(valid, _lookup(w3, m, Sr, R), 0)
            else:
                nb = jnp.where(valid, w3v, 0)
            ms += [(nb > j).astype(jnp.int32) for j in range(NE)]
        st, low, step_tot = _read_merge(stream_ref, cursor, st0, ms,
                                        R, NR, NE, WR,
                                        split_win=split_win,
                                        rowmask=rmask)
        if has_exc:
            if packed23:
                high = jnp.where(
                    nb == 0, jax.lax.shift_right_logical(w23, 2),
                    w23 & ~jnp.int32(3))
            else:
                high = w23
            val = high + low
        elif val_table:
            val = w23
        else:
            val = m                      # identity: dense id IS the value
        out_ref[0, pl.ds(i, 1)] = pltpu.bitcast(val, jnp.uint32)[None]
        return st, cursor + step_tot

    st, cur = jax.lax.fori_loop(
        0, TC, step, (state_scr[:], cur_scr[:]))
    state_scr[:] = st
    cur_scr[:] = cur


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "T_SEC", "NSEC", "Sr",
                                    "WR", "SWr", "log2m", "M", "depth",
                                    "has_exc", "val_table", "packed23",
                                    "NR", "NE", "prows", "ppack",
                                    "w2pack", "split_win", "rowmm",
                                    "interpret"))
def _call_search(stream3d, states2d, n, w2, w3, *pivs, S, R, TC, T_SEC,
                 NSEC, Sr, WR, SWr, log2m, M, depth, has_exc, val_table,
                 packed23, NR, NE, prows, ppack, w2pack,
                 split_win=False, rowmm=False, interpret=False):
    num_tc = T_SEC // TC
    out = pl.pallas_call(
        functools.partial(_kernel_search, S=S, R=R, TC=TC, T_SEC=T_SEC,
                          Sr=Sr, WR=WR, log2m=log2m, M=M, depth=depth,
                          has_exc=has_exc, val_table=val_table,
                          packed23=packed23, NR=NR, NE=NE, prows=prows,
                          ppack=ppack, w2pack=w2pack,
                          split_win=split_win, rowmm=rowmm),
        grid=(NSEC, num_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # states
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec((1, SWr, 128), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),          # stream words
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # w3
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * depth,
        out_specs=pl.BlockSpec((1, TC, R, 128),
                               lambda s, t: (s, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSEC, T_SEC, R, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(states2d, jnp.asarray([[n]], jnp.int32), stream3d, w2, w3, *pivs)
    return out.reshape(NSEC * T_SEC, S)


def stage_search(payload: np.ndarray, states: np.ndarray, st, n: int, *,
                 S: int, T: int, t_sec: int, sec_len, TC: int = 128,
                 sw_bytes: int | None = None, split_win: bool = True,
                 to_device: bool = True, interpret: bool = False):
    """Stage inputs for the pivot-search kernel.  st: tables.SearchTable.
    Returns (args, kwargs) for _call_search.  sw_bytes overrides the
    section-buffer size (block_runtime passes the mesh-wide max so all
    devices share one static shape)."""
    has_exc = st.high is not None
    val_table = st.val is not None
    sigma = st.sigma
    Sr = max(1, -(-sigma // 128))
    packed23 = False
    dummy = np.zeros(1, np.uint32)
    if has_exc:
        high = st.high.astype(np.uint32)
        nbv = st.nb.astype(np.uint32)
        z = nbv == 0
        if (high[z] < (1 << 30)).all() and (high[~z] & 3 == 0).all():
            packed23 = True
            w2 = np.where(z, high << 2, high | nbv).astype(np.uint32)
            w3 = dummy
        else:
            w2 = high
            w3 = nbv
    elif val_table:
        w2 = st.val.astype(np.uint32)
        w3 = dummy
    else:
        w2 = dummy
        w3 = dummy
    NR = max_renorm_rounds(st.log2m)
    NE = int(st.nb.max()) if has_exc else 0
    WR = -(-(512 + (NR + NE) * S) // 512) + 1
    R = S // 128
    # output block is (TC, R, 128) i32, double-buffered: cap its VMEM
    while TC * R * 512 * 2 > (6 << 20) and TC > 8:
        TC //= 2
    while t_sec % TC:
        TC //= 2
    stream3d = _stage_stream(payload, sec_len, WR, sw_bytes)

    def pack16(vals):
        v = np.asarray(vals, dtype=np.uint32)
        if len(v) & 1:
            v = np.concatenate([v, v[-1:]])
        return (v[0::2] | (v[1::2] << np.uint32(16))).astype(np.uint32)

    # u16-pair the deep pivot levels (and w2) to halve shuffle rows
    can16 = st.frame_size <= 0xFFFF
    ppack = tuple(can16 and len(p) >= 256 for p in st.pivots)
    prows, pivs = [], []
    for p, pk in zip(st.pivots, ppack):
        arr = pack16(p) if pk else p.astype(np.uint32)
        r = max(1, -(-len(arr) // 128))
        prows.append(r)
        pivs.append(jnp.asarray(_pad_rows(arr.view(np.int32), r)))
    prows, pivs = tuple(prows), tuple(pivs)
    w2pack = bool((has_exc and packed23 or val_table) and sigma >= 256
                  and int(w2.max()) <= 0xFFFF)
    if w2pack:
        w2 = pack16(w2)
        Sr = max(1, -(-len(w2) // 128))
    dev = jnp.asarray if to_device else (lambda x: x)
    args = (dev(stream3d),
            dev(states.view(np.int32).reshape(R, 128)),
            n,
            jnp.asarray(_pad_rows(w2.view(np.int32), Sr)),
            jnp.asarray(_pad_rows(w3.view(np.int32),
                                  Sr if (has_exc and not packed23)
                                  else 1))) + tuple(pivs)
    kw = dict(S=S, R=R, TC=TC, T_SEC=t_sec, NSEC=stream3d.shape[0],
              Sr=Sr, WR=WR,
              SWr=stream3d.shape[1], log2m=st.log2m, M=st.frame_size,
              depth=st.depth, has_exc=has_exc, val_table=val_table,
              packed23=packed23, NR=NR, NE=NE, prows=prows, ppack=ppack,
              w2pack=w2pack, split_win=split_win, rowmm=_rowmm_env(),
              interpret=interpret)
    return args, kw


def decode_search(payload, states, st, n, *, S, T, t_sec, sec_len,
                  TC=128, split_win=True, interpret=False):
    """One-shot host wrapper for the search kernel."""
    args, kw = stage_search(payload, states, st, n, S=S, T=T,
                            t_sec=t_sec, sec_len=sec_len, TC=TC,
                            split_win=split_win, interpret=interpret)
    return _call_search(*args, **kw)


def stage(payload: np.ndarray, states: np.ndarray, dt, n: int, *,
          S: int, T: int, has_exc: bool, t_sec: int, sec_len,
          TC: int = 128, sw_bytes: int | None = None,
          split_win: bool = True, to_device: bool = True,
          interpret: bool = False):
    """Stage all kernel inputs on device; returns (args, kwargs) for
    _call.  Separated from decode() so callers can amortize the staging
    (PreparedDecoder / production serving).  sw_bytes overrides the
    section-buffer size (block_runtime passes the mesh-wide max so all
    devices share one static shape)."""
    M = dt.frame_size
    Mr = -(-M // 128)
    w1 = (dt.freq.astype(np.uint32) << 16) | dt.offset.astype(np.uint32)
    packed23 = False
    if has_exc:
        high = dt.high.astype(np.uint32)
        nbv = dt.nb.astype(np.uint32)
        z = nbv == 0
        if (high[z] < (1 << 30)).all() and (high[~z] & 3 == 0).all():
            packed23 = True
            w2 = np.where(z, high << 2, high | nbv).astype(np.uint32)
            w3 = np.zeros(1, np.uint32)
        else:
            w2 = high
            w3 = nbv
    else:
        w2 = dt.sym.astype(np.uint32)
        w3 = np.zeros(1, np.uint32)
    # static round counts: M <= 2^16 means at most 2 renorm reads
    # (state >= 2^23/M >= 2^7 after a decode step; two 8-bit refills
    # always reach L = 2^23); exception rounds bounded by the table
    NR = max_renorm_rounds(dt.log2m)
    NE = int(dt.nb.max()) if has_exc else 0
    # window: one slice per step covering all rounds (<= (NR+NE)S bytes)
    WR = -(-(512 + (NR + NE) * S) // 512) + 1
    # TC must divide t_sec exactly (grid step t = sec*T_SEC + tc*TC + i
    # must match the encoder's section cuts).  The double-buffered out
    # block shares VMEM with the slot tables and the double-buffered
    # stream section — subtract them before sizing TC (stage_grouped's
    # budget discipline; the flat 6MB cap OOMed at Mr = 512, S = 4096)
    R = S // 128
    stream3d = _stage_stream(payload, sec_len, WR, sw_bytes)
    tab_rows = Mr * (3 if (has_exc and not packed23) else 2)
    # 8MB pool for the three double-buffered block sets; the kernel
    # stack (bounded ~1.5MB by _lookup_multi_loop) and Mosaic slack
    # take the rest of the 16MB VMEM.  The headline config (Mr=256,
    # SWr~3584) keeps TC=128 under this budget.
    out_budget = max(1 << 20,
                     (8 << 20) - tab_rows * 512
                     - 2 * stream3d.shape[1] * 512)
    while TC * R * 512 * 2 > out_budget and TC > 8:
        TC //= 2
    while t_sec % TC:
        TC //= 2
    t_sec_pad = t_sec
    dev = jnp.asarray if to_device else (lambda x: x)
    args = (dev(stream3d),
            dev(states.view(np.int32).reshape(R, 128)),
            n,
            jnp.asarray(_pad_rows(w1.view(np.int32), Mr)),
            jnp.asarray(_pad_rows(w2.view(np.int32), Mr)),
            jnp.asarray(_pad_rows(w3.view(np.int32),
                                  Mr if (has_exc and not packed23)
                                  else 1)))
    kw = dict(S=S, R=R, TC=TC, T_SEC=t_sec_pad, NSEC=stream3d.shape[0],
              Mr=Mr, WR=WR,
              SWr=stream3d.shape[1], log2m=dt.log2m, has_exc=has_exc,
              packed23=packed23, NR=NR, NE=NE, split_win=split_win,
              rowmm=_rowmm_env(), interpret=interpret)
    return args, kw


def decode(payload: np.ndarray, states: np.ndarray, dt, n: int, *,
           S: int, T: int, has_exc: bool, t_sec: int, sec_len,
           TC: int = 128, split_win: bool = True,
           interpret: bool = False):
    """One-shot host wrapper: stage + run.  Returns (>=T, S) u32."""
    args, kw = stage(payload, states, dt, n, S=S, T=T, has_exc=has_exc,
                     t_sec=t_sec, sec_len=sec_len, TC=TC,
                     split_win=split_win, interpret=interpret)
    return _call(*args, **kw)


# --------------------------------------------------------------------------
# frequency-grouped kernel: state update from NG-sized tables only
# --------------------------------------------------------------------------
#
# The pivot-search kernel scans ~sigma/128 pivot rows per step, so truly
# large alphabets (sigma 2^14..2^20: ans_int over zipf-2^20, word ids,
# uniform16/20) had no production path.  Under the frequency-grouped
# slot layout (ops/grouped.py) the state update needs only:
#   * a binary search over the NG <= sqrt(2M) <= 2896 group slot
#     boundaries (a dozen probe levels totalling ~25 rows),
#   * three NG-sized lookups (f, GM magic, first rank), and
#   * one exact Granlund-Montgomery division by f (the same multiply-
#     high construction the encode kernel uses, pallas_encode._mulhi32).
# The only sigma-sized reads left are the bit-packed value/high planes
# (rank -> output), off the sequential critical path and costing
# ceil(sigma/(32/bits))/128 shuffle rows shared by all S lanes.
# Reference counterpart: ans_int.hpp:106-161 shrinks per-slot entries by
# table size; here the per-slot table is gone entirely.


def _lookup_acc(rows, idx, Mr, B, chunk=16):
    """_lookup with bounded live memory: the single-table case of
    _lookup_multi (chunk-accumulated, scoped VMEM ~chunk*(B,128)
    instead of Mr*(B,128)).  Required for the sigma-sized plane scans:
    zipf-2^20's value planes are ~5000 rows, and Mosaic scopes every
    masked term of a plain _lookup (measured OOM at 40 rows x (256,128)
    on the encode side, choose_g)."""
    return _lookup_multi((rows,), idx, Mr, B, chunk)[0]


def _lookup_multi(tables_, idx, Mr, B, chunk=16):
    """Several same-shape tables read at ONE index vector: the idx
    decomposition and the per-row hi==h compare are computed once and
    shared (the direct kernel reads w1/w2/w3 at the same slot, the
    grouped kernel g_f/g_rank0/g_magic at the same group id).  Each
    table keeps _lookup's balanced OR tree within a chunk so the row
    loop pipelines, and chunks accumulate sequentially so the scoped
    VMEM stays ~chunk*len(tables_)*(B,128) even at the direct kernel's
    Mr = 512 ceiling (PALLAS_MAX_FRAME/128; Mosaic scopes every live
    masked term — see _lookup_acc)."""
    lo = idx & 127
    hi = idx >> 7
    accs = [None] * len(tables_)
    for c0 in range(0, Mr, chunk):
        terms = [[] for _ in tables_]
        for h in range(c0, min(c0 + chunk, Mr)):
            sel = hi == h
            for t, rows in enumerate(tables_):
                row = jnp.broadcast_to(rows[h:h + 1, :], (B, 128))
                terms[t].append(
                    jnp.where(sel,
                              jnp.take_along_axis(row, lo, axis=1), 0))
        for t, ts in enumerate(terms):
            while len(ts) > 1:
                nxt = [a | b for a, b in zip(ts[::2], ts[1::2])]
                if len(ts) & 1:
                    nxt.append(ts[-1])
                ts = nxt
            accs[t] = ts[0] if accs[t] is None else accs[t] | ts[0]
    return accs


# unrolled row scans above this limit go through a real fori_loop: the
# Mosaic kernel stack allocator gives every *program point* its own
# scoped-VMEM slot (no liveness reuse across an unrolled loop — the
# chunk-accumulated _lookup_acc still OOMed at 5970 rows x (32,128) =
# 100.2M scoped on zipf-2^20, v5e measured), while a lax.fori_loop body
# is one program point whose stack is reused every iteration
_PLANE_LOOP_MIN_ROWS = 32
_PLANE_LOOP_CHUNK = 32


def _lookup_multi_loop(refs, idx, Mr, B, chunk=None):
    """_lookup_multi over VMEM *refs*, scanning rows in dynamically-
    sliced chunks inside a fori_loop (bounded kernel stack — the
    unrolled _lookup_multi at Mr = 512, R = 32 measured a 17.7MB scoped
    VMEM stack on v5e: Mosaic gives every unrolled program point its
    own slot; see _lookup_loop).  The hi==row compare is shared across
    tables like _lookup_multi's."""
    lo = idx & 127
    hi = idx >> 7
    if chunk is None:
        chunk = max(8, _PLANE_LOOP_CHUNK // len(refs))
    chunk = min(chunk, Mr)
    nchunks = -(-Mr // chunk)
    nt = len(refs)

    def body(c, accs):
        c0 = jnp.minimum(c * chunk, Mr - chunk)
        blks = [r[pl.ds(c0, chunk), :] for r in refs]
        terms = [[] for _ in range(nt)]
        for j in range(chunk):
            sel = hi == c0 + j
            for t in range(nt):
                row = jnp.broadcast_to(blks[t][j:j + 1, :], (B, 128))
                terms[t].append(
                    jnp.where(sel,
                              jnp.take_along_axis(row, lo, axis=1), 0))
        outs = []
        for t in range(nt):
            ts = terms[t]
            while len(ts) > 1:
                nxt = [a | b for a, b in zip(ts[::2], ts[1::2])]
                if len(ts) & 1:
                    nxt.append(ts[-1])
                ts = nxt
            outs.append(accs[t] | ts[0])
        return tuple(outs)

    init = tuple(jnp.zeros((B, 128), jnp.int32) for _ in range(nt))
    return jax.lax.fori_loop(0, nchunks, body, init)


def _lookup_loop(pref, idx, nrows, B, chunk=_PLANE_LOOP_CHUNK):
    """_lookup over a VMEM *ref*, scanning rows in dynamically-sliced
    chunks inside a fori_loop so scoped VMEM is ~chunk*(B,128) however
    large the table.  The tail chunk is clamped (rows rescanned by the
    overlap fail their exact hi==h test or OR in the identical value —
    idempotent either way).  Requires nrows >= chunk rows staged."""
    lo = idx & 127
    hi = idx >> 7
    chunk = min(chunk, nrows)
    nchunks = -(-nrows // chunk)

    def body(c, acc):
        c0 = jnp.minimum(c * chunk, nrows - chunk)
        blk = pref[pl.ds(c0, chunk), :]
        terms = []
        for j in range(chunk):
            row = jnp.broadcast_to(blk[j:j + 1, :], (B, 128))
            terms.append(
                jnp.where(hi == c0 + j,
                          jnp.take_along_axis(row, lo, axis=1), 0))
        while len(terms) > 1:
            nxt = [a | b for a, b in zip(terms[::2], terms[1::2])]
            if len(terms) & 1:
                nxt.append(terms[-1])
            terms = nxt
        return acc | terms[0]

    return jax.lax.fori_loop(0, nchunks, body,
                             jnp.zeros((B, 128), jnp.int32))


def _plane_lookup(rows_arr, idx, nrows, bits, B):
    """Read entry idx from a bit-packed plane table ((nrows,128) i32 of
    32/bits-entry words; ops/grouped.Plane layout).  rows_arr may be a
    materialized (nrows,128) value (small planes) or a VMEM ref (large
    planes, scanned by the bounded-stack fori_loop)."""
    per = 32 // bits
    widx = jax.lax.shift_right_logical(idx, per.bit_length() - 1)
    if nrows > _PLANE_LOOP_MIN_ROWS:
        word = _lookup_loop(rows_arr, widx, nrows, B)
    else:
        word = _lookup(rows_arr, widx, nrows, B)
    sh = (idx & (per - 1)) * bits
    return jax.lax.shift_right_logical(word, sh) & ((1 << bits) - 1)


def _kernel_grouped(states_ref, n_ref, stream_ref, gf_ref, gr0_ref,
                    gmg_ref, gpr_ref, *rest, S, R, TC, T_SEC, NGr, WR,
                    log2m, M, gdepth, gprows, planespec, nbrows,
                    has_exc, NR, NE, split_win, use_prank=False,
                    rowmm=False):
    from .pallas_encode import _mulhi32
    gpiv_refs = rest[:gdepth]
    plane_refs = rest[gdepth:gdepth + len(planespec)]
    pos = gdepth + len(planespec)
    nb_ref = rest[pos] if has_exc else None
    pos += 1 if has_exc else 0
    out_ref = rest[pos]
    state_scr, cur_scr = rest[pos + 1], rest[pos + 2]
    sec = pl.program_id(0)
    tc = pl.program_id(1)
    mask = (1 << log2m) - 1
    L = A_L
    _lsr = jax.lax.shift_right_logical

    @pl.when((sec == 0) & (tc == 0))
    def _init():
        state_scr[:] = states_ref[:]

    @pl.when(tc == 0)
    def _new_section():
        cur_scr[:] = jnp.zeros((1, 128), jnp.int32)

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    n_val = n_ref[0, 0]
    gf = gf_ref[:]
    gr0 = gr0_ref[:]
    gmg = gmg_ref[:]
    gpr = gpr_ref[:] if use_prank else None
    gpivs = [p[:] for p in gpiv_refs]
    # small planes are hoisted to values once; large planes stay REFS so
    # _plane_lookup's fori_loop can dynamic-slice row chunks (bounded
    # kernel stack — see _lookup_loop)
    planes = [p if spec[1] > _PLANE_LOOP_MIN_ROWS else p[:]
              for p, spec in zip(plane_refs, planespec)]
    nbp = ((nb_ref if nbrows > _PLANE_LOOP_MIN_ROWS else nb_ref[:])
           if has_exc else None)
    rmask = rowmm_mask(R, NR + NE) if (rowmm and R > 1) else None

    def step(i, carry):
        state, cursor = carry            # (R,128) i32, (1,128) i32
        t = sec * T_SEC + tc * TC + i
        valid = (t * S + lane_global) < n_val
        slot = state & mask
        # group search: m doubles in running-rank form (the pivot index
        # at level k is m itself); lb tracks the bracketing boundary, so
        # g_slot0[m] falls out of the search for free
        m = jnp.zeros((R, 128), jnp.int32)
        lb = jnp.zeros((R, 128), jnp.int32)
        for k in range(gdepth - 1, -1, -1):
            if gprows[k] == 1:
                pv = _take1(gpivs[k], m, R)
            else:
                pv = _lookup(gpivs[k], m, gprows[k], R)
            take = slot >= pv
            m = m + m + take.astype(jnp.int32)
            lb = jnp.where(take, pv, lb)
        if use_prank:
            f, r0, mg, prw = _lookup_multi((gf, gr0, gmg, gpr), m,
                                           NGr, R)
        else:
            f, r0, mg = _lookup_multi((gf, gr0, gmg), m, NGr, R)
        x = slot - lb
        # j = x / f exactly: GM multiply-high; f == 1 selected around
        e = _lsr(pltpu.bitcast((f - 1).astype(jnp.float32), jnp.int32),
                 23) - 127
        sh = jnp.maximum(e, 0)
        mh = _mulhi32(x, mg)
        j = _lsr(mh + _lsr(x - mh, 1), sh)
        j = jnp.where(f == 1, x, j)
        rank = r0 + j
        if use_prank:
            # packed per-group word: padded start | advance << 27
            # (ops/grouped.plan_rank_planes per-group anchor density)
            prank = ((prw & _PRANK_MASK)
                     + jax.lax.shift_left(j, _lsr(prw,
                                                  _PRANK_SHIFT_BITS)))
        else:
            prank = rank
        st0 = f * _lsr(state, log2m) + (x - j * f)
        st0 = jnp.where(valid, st0, state)
        ms = [(valid & (st0 < (L >> (8 * jj)))).astype(jnp.int32)
              for jj in range(NR)]
        if has_exc:
            nb = _plane_lookup(nbp, rank, nbrows, 2, R)
            nb = jnp.where(valid, nb, 0)
            ms += [(nb > jj).astype(jnp.int32) for jj in range(NE)]
        st, low, step_tot = _read_merge(stream_ref, cursor, st0, ms,
                                        R, NR, NE, WR,
                                        split_win=split_win,
                                        rowmask=rmask)
        if planespec:
            # composed by ADDITION: direct planes are disjoint
            # bitfields (sum == or) and anchored planes carry real
            # anchor + residual adds (ops/grouped.plan_rank_planes)
            comp = jnp.zeros((R, 128), jnp.int32)
            for pref, (bits, rows, shift, ixs, pad) in zip(planes,
                                                           planespec):
                idx = prank if pad else rank
                if ixs:
                    idx = _lsr(idx, ixs)
                comp = comp + (_plane_lookup(pref, idx, rows, bits, R)
                               << shift)
        elif has_exc:
            comp = jnp.zeros((R, 128), jnp.int32)  # all-zero high table
        else:
            comp = rank                  # identity: rank IS the value
        val = comp + low if has_exc else comp
        out_ref[0, pl.ds(i, 1)] = pltpu.bitcast(val, jnp.uint32)[None]
        return st, cursor + step_tot

    st, cur = jax.lax.fori_loop(
        0, TC, step, (state_scr[:], cur_scr[:]))
    state_scr[:] = st
    cur_scr[:] = cur


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "T_SEC", "NSEC", "NGr",
                                    "WR", "SWr", "log2m", "M", "gdepth",
                                    "gprows", "planespec", "nbrows",
                                    "has_exc", "NR", "NE", "split_win",
                                    "use_prank", "rowmm", "interpret"))
def _call_grouped(stream3d, states2d, n, gf, gr0, gmg, gpr, *rest, S, R,
                  TC, T_SEC, NSEC, NGr, WR, SWr, log2m, M, gdepth, gprows,
                  planespec, nbrows, has_exc, NR, NE, split_win=False,
                  use_prank=False, rowmm=False, interpret=False):
    num_tc = T_SEC // TC
    nextra = gdepth + len(planespec) + (1 if has_exc else 0)
    out = pl.pallas_call(
        functools.partial(_kernel_grouped, S=S, R=R, TC=TC, T_SEC=T_SEC,
                          NGr=NGr, WR=WR, log2m=log2m, M=M, gdepth=gdepth,
                          gprows=gprows, planespec=planespec,
                          nbrows=nbrows, has_exc=has_exc, NR=NR, NE=NE,
                          split_win=split_win, use_prank=use_prank,
                          rowmm=rowmm),
        grid=(NSEC, num_tc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),          # states
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec((1, SWr, 128), lambda s, t: (s, 0, 0),
                         memory_space=pltpu.VMEM),          # stream words
            pl.BlockSpec(memory_space=pltpu.VMEM),          # g_f
            pl.BlockSpec(memory_space=pltpu.VMEM),          # g_rank0
            pl.BlockSpec(memory_space=pltpu.VMEM),          # g_magic
            pl.BlockSpec(memory_space=pltpu.VMEM),          # g_prank0
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * nextra,
        out_specs=pl.BlockSpec((1, TC, R, 128),
                               lambda s, t: (s, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSEC, T_SEC, R, 128), jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((R, 128), jnp.int32),
            pltpu.VMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
    )(states2d, jnp.asarray([[n]], jnp.int32), stream3d, gf, gr0, gmg,
      gpr, *rest)
    return out.reshape(NSEC * T_SEC, S)


def stage_grouped(payload: np.ndarray, states: np.ndarray, gt, n: int, *,
                  S: int, T: int, t_sec: int, sec_len, TC: int = 128,
                  sw_bytes: int | None = None, split_win: bool = True,
                  to_device: bool = True, interpret: bool = False):
    """Stage inputs for the grouped kernel.  gt: grouped.GroupTable.
    Returns (args, kwargs) for _call_grouped."""
    lay = gt.layout
    NG = lay.num_groups
    NGr = max(1, -(-NG // 128))
    NR = max_renorm_rounds(lay.log2m)
    NE = gt.max_nb if gt.has_exc else 0
    WR = -(-(512 + (NR + NE) * S) // 512) + 1
    R = S // 128
    stream3d = _stage_stream(payload, sec_len, WR, sw_bytes)
    # out-block VMEM budget: the sigma-sized plane tables and the
    # double-buffered stream section share the 16MB with the
    # double-buffered output block — subtract them before sizing TC
    planes = gt.high_planes if gt.has_exc else gt.val_planes
    plane_bytes = sum(p.rows * 512 for p in planes)
    if gt.nb_plane is not None:
        plane_bytes += gt.nb_plane.rows * 512
    out_budget = max(1 << 20,
                     (12 << 20) - plane_bytes - 2 * stream3d.shape[1] * 512)
    while TC * R * 512 * 2 > out_budget and TC > 8:
        TC //= 2
    while t_sec % TC:
        TC //= 2
    gprows, gpivs = [], []
    for p in lay.slot_pivots:
        r = max(1, -(-len(p) // 128))
        gprows.append(r)
        gpivs.append(jnp.asarray(_pad_rows(p.view(np.int32), r)))
    planespec = tuple((p.bits, p.rows, p.shift, p.idx_shift, p.padded)
                      for p in planes)
    plane_arrs = [jnp.asarray(_pad_rows(p.words.view(np.int32), p.rows))
                  for p in planes]
    rest = tuple(gpivs) + tuple(plane_arrs)
    nbrows = 1
    if gt.has_exc:
        nbrows = gt.nb_plane.rows
        rest += (jnp.asarray(_pad_rows(gt.nb_plane.words.view(np.int32),
                                       nbrows)),)
    use_prank = gt.needs_prank
    gpr_np = (gt.g_prank0.view(np.int32) if use_prank
              else np.zeros(1, np.int32))
    dev = jnp.asarray if to_device else (lambda x: x)
    args = (dev(stream3d),
            dev(states.view(np.int32).reshape(R, 128)),
            n,
            jnp.asarray(_pad_rows(lay.g_f.view(np.int32), NGr)),
            jnp.asarray(_pad_rows(lay.g_rank0.view(np.int32), NGr)),
            jnp.asarray(_pad_rows(lay.g_magic.view(np.int32), NGr)),
            jnp.asarray(_pad_rows(gpr_np, NGr if use_prank else 1))
            ) + rest
    kw = dict(S=S, R=R, TC=TC, T_SEC=t_sec, NSEC=stream3d.shape[0],
              NGr=NGr, WR=WR, SWr=stream3d.shape[1], log2m=lay.log2m,
              M=lay.frame_size, gdepth=lay.slot_depth,
              gprows=tuple(gprows), planespec=planespec, nbrows=nbrows,
              has_exc=gt.has_exc, NR=NR, NE=NE, split_win=split_win,
              use_prank=use_prank, rowmm=_rowmm_env(),
              interpret=interpret)
    return args, kw


def decode_grouped(payload, states, gt, n, *, S, T, t_sec, sec_len,
                   TC=128, split_win=True, interpret=False):
    """One-shot host wrapper for the grouped kernel."""
    args, kw = stage_grouped(payload, states, gt, n, S=S, T=T,
                             t_sec=t_sec, sec_len=sec_len, TC=TC,
                             split_win=split_win, interpret=interpret)
    return _call_grouped(*args, **kw)
