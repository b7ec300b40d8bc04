"""Pallas TPU decode kernel for the S-lane rANS format (fmt A).

The XLA scan engine (lane_codec.decode_lanes) round-trips lane state
through HBM every step; this kernel keeps all S states, byte cursors and
the decode table resident in VMEM for the whole T-step loop — the
TPU-native equivalent of the reference's register-resident 4-state loop
(reference: ans_fold.hpp:283-310), scaled to S lanes on the VPU.

Layout:
  * lanes are processed in groups of G (grid dim 0); a group's substreams
    are contiguous in the packed payload, so the host re-stages the
    stream into a (num_groups, GMAX) u32-word array, one row per group
    (padded).  Each grid step sees its row as a VMEM block.
  * the T loop is tiled into chunks of TC steps (grid dim 1, fastest
    axis); per-group state/cursor scratch persists across chunks.
  * output block (TC, G) u32 at (chunk, group) — assembled global shape
    (T, S), identical to the XLA engine's.

Byte reads are u32-word gathers + shift/mask (Mosaic has no u8 gather);
each decode step costs 3 table gathers (+2 for fold/msb) and up to 6
byte gathers, all from VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import A_L

U32 = jnp.uint32


def _kernel(lane_rel_ref, states_ref, n_ref, stream_ref, freq_ref, off_ref,
            sym_ref, high_ref, nb_ref, out_ref, state_scr, cur_scr,
            *, S, G, TC, log2m, has_exc):
    g = pl.program_id(0)
    tc = pl.program_id(1)
    mask = jnp.uint32((1 << log2m) - 1)
    L = jnp.uint32(A_L)
    n = n_ref[0, 0]

    @pl.when(tc == 0)
    def _init():
        state_scr[:] = states_ref[0]
        cur_scr[:] = lane_rel_ref[0]

    lane_local = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    lane_global = g * G + lane_local
    words = stream_ref[0, 0]       # (GW,) u32 view of this group's bytes
    freq = freq_ref[:]
    off = off_ref[:]
    sym = sym_ref[:]
    if has_exc:
        high = high_ref[:]
        nb_t = nb_ref[:]

    def read_byte(cur):
        w = jnp.take(words, cur >> 2, mode="clip")
        return (w >> ((cur & 3).astype(U32) * U32(8))) & U32(0xFF)

    def step(i, carry):
        state, cur = carry
        t = tc * TC + i
        valid = (t * S + lane_global) < n
        slot = (state & mask).astype(jnp.int32)
        f = jnp.take(freq, slot, mode="clip")
        o = jnp.take(off, slot, mode="clip")
        st = f * (state >> U32(log2m)) + o
        for _ in range(3):
            need = valid & (st < L)
            byte = read_byte(cur)
            st = jnp.where(need, (st << U32(8)) | byte, st)
            cur = cur + need.astype(jnp.int32)
        st = jnp.where(valid, st, state)
        if has_exc:
            k = jnp.where(valid, jnp.take(nb_t, slot, mode="clip"),
                          U32(0)).astype(jnp.int32)
            low = jnp.zeros_like(st)
            for j in range(3):
                take = j < k
                byte = read_byte(cur)
                low = jnp.where(take, (low << U32(8)) | byte, low)
                cur = cur + take.astype(jnp.int32)
            val = jnp.take(high, slot, mode="clip") + low
        else:
            val = jnp.take(sym, slot, mode="clip")
        out_ref[pl.ds(i, 1)] = val.reshape(1, 1, 1, G)
        return st, cur

    state, cur = jax.lax.fori_loop(
        0, TC, step, (state_scr[:], cur_scr[:]))
    state_scr[:] = state
    cur_scr[:] = cur


@functools.partial(jax.jit,
                   static_argnames=("S", "G", "T", "TC", "GW", "log2m",
                                    "has_exc", "interpret"))
def decode_lanes_pallas(stream_groups, lane_rel, states, n, freq, off, sym,
                        high, nb, *, S, G, T, TC, GW, log2m, has_exc,
                        interpret=False):
    """stream_groups: (num_groups, GW) u32 per-group word-packed payload;
    lane_rel: (S,) i32 cursor start relative to the group's byte 0;
    states: (S,) u32.  Returns (T_pad, S) u32 with T_pad = ceil(T/TC)*TC.
    """
    num_groups = S // G
    num_tc = -(-T // TC)
    T_pad = num_tc * TC
    grid = (num_groups, num_tc)

    out = pl.pallas_call(
        functools.partial(_kernel, S=S, G=G, TC=TC, log2m=log2m,
                          has_exc=has_exc),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),          # lane_rel
            pl.BlockSpec((1, 1, G), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),          # states
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec((1, 1, GW), lambda g, t: (g, 0, 0),
                         memory_space=pltpu.VMEM),          # stream words
            pl.BlockSpec(memory_space=pltpu.VMEM),          # freq
            pl.BlockSpec(memory_space=pltpu.VMEM),          # off
            pl.BlockSpec(memory_space=pltpu.VMEM),          # sym
            pl.BlockSpec(memory_space=pltpu.VMEM),          # high
            pl.BlockSpec(memory_space=pltpu.VMEM),          # nb
        ],
        out_specs=pl.BlockSpec((TC, 1, 1, G), lambda g, t: (t, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, num_groups, 1, G),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, G), jnp.uint32),                 # states
            pltpu.VMEM((1, G), jnp.int32),                  # cursors
        ],
        interpret=interpret,
    )(lane_rel.reshape(num_groups, 1, G),
      states.reshape(num_groups, 1, G),
      jnp.asarray([[n]], jnp.int32),
      stream_groups.reshape(num_groups, 1, -1), freq, off, sym, high, nb)
    return out.reshape(T_pad, S)


def stage_stream_groups(payload: np.ndarray, lane_len: np.ndarray,
                        S: int, G: int):
    """Host staging: split the packed payload at group boundaries into a
    (num_groups, GW*4) byte matrix viewed as u32 words, plus per-lane
    relative start offsets.  Group rows are padded; GW is rounded up so
    recompilation is bounded."""
    num_groups = S // G
    lane_start = np.concatenate(([0], np.cumsum(lane_len)[:-1]))
    gbound = lane_start[::G]                       # start byte per group
    gend = np.append(gbound[1:], int(lane_len.sum()))
    glen = gend - gbound
    gw_bytes = int(max(8, glen.max() + 8))
    gw_bytes = -(-gw_bytes // 1024) * 1024         # 1KB granularity
    mat = np.zeros((num_groups, gw_bytes), dtype=np.uint8)
    for g in range(num_groups):
        mat[g, : glen[g]] = payload[gbound[g]:gend[g]]
    lane_rel = (lane_start - np.repeat(gbound, G)).astype(np.int32)
    words = mat.view("<u4").reshape(num_groups, gw_bytes // 4)
    return words, lane_rel, gw_bytes // 4
