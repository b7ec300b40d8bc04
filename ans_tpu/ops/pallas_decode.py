"""Pallas TPU decode kernel for the lockstep S-lane rANS format (fmt 2).

The XLA scan engine (lane_codec.decode_lanes) round-trips lane state
through HBM every step; this kernel keeps all S states, the shared
cursor, the decode table and the whole stream resident in VMEM for the
full T-step loop — the TPU-native equivalent of the reference's
register-resident 4-state loop (reference: ans_fold.hpp:283-310), scaled
to S lanes on the VPU.

Mosaic's vector gather support is limited to lane-dim shuffles
(`take_along_axis` axis=1, indices < 128), so every random access is
decomposed as hi/lo = idx >> 7 / idx & 127 and materialized as one lane
shuffle per 128-entry table row plus a select — the format was designed
so all such accesses are small:

  * decode-table lookups: 3 per step (freq<<16|offset, high-or-sym, nb),
    each M/128 shuffle+select pairs;
  * stream reads: 6 per-round gathers from a <= (512 + S)-byte window
    past the shared cursor (lockstep rounds bound the range), each
    WR = ceil((512+S)/512)+1 shuffle+select pairs over u32 words.

Per-lane byte ranks come from an inclusive prefix sum over all S lanes
(Hillis-Steele with pltpu.roll along lanes, then across sublane rows).

All arithmetic runs in i32; fmt 2 invariants keep every value below
2^31 (state in [2^23, 2^31), window offsets < 512 + S), so signed
compares and shifts are exact.  Final values are bitcast to u32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import A_L


def _prefix(x, R):
    """Inclusive->exclusive prefix sum of (R,128) i32 over all S=R*128
    positions in lane-major order; returns (exclusive (R,128), total)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    inc = x
    for d in (1, 2, 4, 8, 16, 32, 64):
        inc = inc + jnp.where(lane >= d, pltpu.roll(inc, d, axis=1), 0)
    row_tot = jnp.broadcast_to(inc[:, 127:128], (R, 128))
    if R > 1:
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        rinc = row_tot
        d = 1
        while d < R:
            rinc = rinc + jnp.where(row >= d, pltpu.roll(rinc, d, axis=0),
                                    0)
            d *= 2
        excl_row = rinc - row_tot
        total = rinc[R - 1, 0]
    else:
        excl_row = jnp.zeros_like(row_tot)
        total = row_tot[0, 0]
    return (inc - x) + excl_row, total


def _lookup(rows, idx, R, Mr):
    """rows: (Mr, 128) i32 table; idx: (R,128) i32 in [0, Mr*128).
    One lane shuffle + select per table row."""
    lo = idx & 127
    hi = idx >> 7
    out = jnp.zeros((R, 128), jnp.int32)
    for h in range(Mr):
        row = jnp.broadcast_to(rows[h:h + 1, :], (R, 128))
        y = jnp.take_along_axis(row, lo, axis=1)
        out = jnp.where(hi == h, y, out)
    return out


def _kernel(states_ref, n_ref, stream_ref, w1_ref, w2_ref, w3_ref,
            out_ref, state_scr, cur_scr, *, S, R, TC, T_SEC, Mr, WR,
            log2m, has_exc, ablate=()):
    sec = pl.program_id(0)
    tc = pl.program_id(1)
    mask = (1 << log2m) - 1
    L = A_L

    @pl.when((sec == 0) & (tc == 0))
    def _init():
        state_scr[:] = states_ref[:]

    @pl.when(tc == 0)
    def _new_section():
        cur_scr[0, 0] = 0          # cursor is relative to the section

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    w3 = w3_ref[:]

    def read_round(cursor, take, st_or_low):
        """One lockstep byte round: rank -> window gather -> merge."""
        ti = take.astype(jnp.int32)
        if "prefix" in ablate:
            rank, tot = ti, jnp.int32(1)
        else:
            rank, tot = _prefix(ti, R)
        if "window" in ablate:
            byte = rank & 0xFF
        else:
            row0 = cursor >> 9                   # 512-byte window rows
            win = stream_ref[0, pl.ds(row0, WR), :]  # (WR,128) i32 words
            byte_pos = (cursor & 511) + rank
            q = byte_pos >> 2
            w = _lookup(win, q, R, WR)
            byte = (w >> ((byte_pos & 3) * 8)) & 0xFF
        merged = jnp.where(take, (st_or_low << 8) | byte, st_or_low)
        return merged, cursor + tot

    def step(i, carry):
        state = state_scr[:]
        cursor = cur_scr[0, 0]
        t = sec * T_SEC + tc * TC + i
        valid = (t * S + lane_global) < n_ref[0, 0]
        slot = state & mask
        if "tables" in ablate:
            word1 = slot | (1 << 16)
        else:
            word1 = _lookup(w1, slot, R, Mr)
        f = jax.lax.shift_right_logical(word1, 16)
        off = word1 & 0xFFFF
        st0 = f * jax.lax.shift_right_logical(state, log2m) + off
        st0 = jnp.where(valid, st0, state)
        rc1 = valid & (st0 < L)
        rc2 = valid & (st0 < (L >> 8))
        rc3 = valid & (st0 < (L >> 16))
        st, cursor = read_round(cursor, rc1, st0)
        st, cursor = read_round(cursor, rc2, st)
        st, cursor = read_round(cursor, rc3, st)
        if has_exc:
            if "tables" in ablate:
                nb = jnp.where(valid, slot & 3, 0)
            else:
                nb = jnp.where(valid, _lookup(w3, slot, R, Mr), 0)
            low = jnp.zeros((R, 128), jnp.int32)
            low, cursor = read_round(cursor, nb > 0, low)
            low, cursor = read_round(cursor, nb > 1, low)
            low, cursor = read_round(cursor, nb > 2, low)
            val = (low if "tables" in ablate
                   else _lookup(w2, slot, R, Mr) + low)
        else:
            val = slot if "tables" in ablate else _lookup(w2, slot, R, Mr)
        state_scr[:] = st
        cur_scr[0, 0] = cursor
        out_ref[0, pl.ds(i, 1)] = pltpu.bitcast(val, jnp.uint32)[None]
        return 0

    jax.lax.fori_loop(0, TC, step, 0)


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "T_SEC", "NSEC", "Mr",
                                    "WR", "SWr", "log2m", "has_exc",
                                    "interpret", "ablate"))
def _call(stream3d, states2d, n, w1, w2, w3, *, S, R, TC, T_SEC, NSEC, Mr,
          WR, SWr, log2m, has_exc, interpret=False, ablate=()):
    num_tc = T_SEC // TC
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, R=R, TC=TC, T_SEC=T_SEC, Mr=Mr,
                          WR=WR, log2m=log2m, has_exc=has_exc,
                          ablate=ablate),
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
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(states2d, jnp.asarray([[n]], jnp.int32), stream3d, w1, w2, w3)
    return out.reshape(NSEC * T_SEC, S)


def _pad_rows(arr_i32: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, 128), dtype=np.int32)
    flat = arr_i32.reshape(-1)
    out.reshape(-1)[: len(flat)] = flat
    return out


def decode(payload: np.ndarray, states: np.ndarray, dt, n: int, *,
           S: int, T: int, has_exc: bool, t_sec: int, sec_len,
           TC: int = 32, interpret: bool = False, ablate=()):
    """Host wrapper: pack tables, stage each stream section as padded
    (SWr, 128) i32 word rows, run the kernel.  Returns (>=T, S) u32."""
    M = dt.frame_size
    Mr = -(-M // 128)
    w1 = (dt.freq.astype(np.uint32) << 16) | dt.offset.astype(np.uint32)
    if has_exc:
        w2 = dt.high.astype(np.uint32)
        w3 = dt.nb.astype(np.uint32)
    else:
        w2 = dt.sym.astype(np.uint32)
        w3 = np.zeros(1, np.uint32)
    WR = -(-(512 + S) // 512) + 1
    sec_len = np.asarray(sec_len, dtype=np.int64)
    nsec = len(sec_len)
    t_sec_pad = -(-t_sec // TC) * TC
    sw_bytes = int(sec_len.max()) + WR * 512
    sw_bytes = -(-sw_bytes // (128 * 1024)) * (128 * 1024)  # bucketed
    mat = np.zeros((nsec, sw_bytes), dtype=np.uint8)
    off = 0
    for s in range(nsec):
        mat[s, : sec_len[s]] = payload[off:off + sec_len[s]]
        off += int(sec_len[s])
    stream3d = mat.view("<i4").reshape(nsec, -1, 128)
    R = S // 128
    return _call(
        jnp.asarray(stream3d),
        jnp.asarray(states.view(np.int32).reshape(R, 128)),
        n,
        jnp.asarray(_pad_rows(w1.view(np.int32), Mr)),
        jnp.asarray(_pad_rows(w2.view(np.int32), Mr)),
        jnp.asarray(_pad_rows(w3.view(np.int32), Mr if has_exc else 1)),
        S=S, R=R, TC=TC, T_SEC=t_sec_pad, NSEC=nsec, Mr=Mr, WR=WR,
        SWr=stream3d.shape[1], log2m=dt.log2m, has_exc=has_exc,
        interpret=interpret, ablate=ablate)
