"""Pallas TPU encode kernel for the lockstep S-lane rANS format (fmt 2).

Encode is a reverse-order scan with data-dependent byte emission.  The
placement (count-then-place compaction) is a big parallel scatter that
XLA handles well on HBM; the sequential scan is what the XLA engine does
poorly (one tiny HBM-round-trip step per symbol row).  So the split is:

  * this kernel runs the scan: S states resident in VMEM across the
    whole reverse T loop, per-symbol encoder-table lookups via lane
    shuffles, renormalization, and the state update with the division
    replaced by an exact Granlund-Montgomery multiply-high
    (tables.EncTable.magic/mlog2 — no u64, no hardware divide);
  * per (step, lane) it emits one packed word
        r0 | r1<<8 | r2<<16 | rc<<24
    (the <=3 renorm bytes low-byte-first and their count); the XLA
    placement pass (lane_codec.place_stream) turns those words plus the
    exception-byte arrays into the final per-round stream.

The grid walks T chunks in REVERSE (index maps flip the block order) so
states flow T-1 -> 0; final states are written on the last grid step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tables import A_L

_lsr = jax.lax.shift_right_logical


def _lookup(rows, idx, Mr, B):
    """Balanced-OR-tree lane-shuffle lookup (see pallas_decode)."""
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


def _mulhi32(a, b):
    """High 32 bits of the u32 product, via 16-bit partials (i32 bit
    patterns, logical shifts)."""
    a0 = a & 0xFFFF
    a1 = _lsr(a, 16)
    b0 = b & 0xFFFF
    b1 = _lsr(b, 16)
    lo = a0 * b0
    mid1 = a1 * b0
    mid2 = a0 * b1
    cross = _lsr(lo, 16) + (mid1 & 0xFFFF) + (mid2 & 0xFFFF)
    return a1 * b1 + _lsr(mid1, 16) + _lsr(mid2, 16) + _lsr(cross, 16)


def _kernel(wa_ref, n_ref, t1_ref, t2_ref, t3_ref, out_ref, states_ref,
            state_scr, *, S, R, TC, NT, Msr, log2m):
    g = pl.program_id(0)
    chunk = NT - 1 - g                  # walk chunks backwards

    @pl.when(g == 0)
    def _init():
        state_scr[:] = jnp.full((R, 128), A_L, jnp.int32)

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    n_val = n_ref[0, 0]
    t1 = t1_ref[:]
    t2 = t2_ref[:]
    t3 = t3_ref[:]

    def step(i, state):
        ri = TC - 1 - i                 # walk rows backwards in chunk
        t = chunk * TC + ri
        valid = (t * S + lane_global) < n_val
        sym = wa_ref[0, pl.ds(ri, 1)][0] & ((1 << 24) - 1)
        w1 = _lookup(t1, sym, Msr, R)   # freq<<16 | base
        f = _lsr(w1, 16)
        base = w1 & 0xFFFF
        ub = f << (31 - log2m)
        # renormalize: emit low bytes while state >= ub (<= 3)
        st = state
        e0 = valid & (st >= ub)
        b0 = st & 0xFF
        st = jnp.where(e0, _lsr(st, 8), st)
        e1 = valid & (st >= ub)
        b1 = st & 0xFF
        st = jnp.where(e1, _lsr(st, 8), st)
        e2 = valid & (st >= ub)
        b2 = st & 0xFF
        st = jnp.where(e2, _lsr(st, 8), st)
        rc = (e0.astype(jnp.int32) + e1.astype(jnp.int32)
              + e2.astype(jnp.int32))
        # q = st / f via GM multiply-high (exact; f == 1 special-cased)
        magic = _lookup(t2, sym, Msr, R)
        l = _lookup(t3, sym, Msr, R)
        mh = _mulhi32(st, magic)
        q = _lsr(mh + _lsr(st - mh, 1), jnp.maximum(l - 1, 0))
        q = jnp.where(f == 1, st, q)
        r = st - q * f
        newst = (q << log2m) + r + base
        state = jnp.where(valid, newst, state)
        out_ref[0, pl.ds(ri, 1)] = (
            b0 | (b1 << 8) | (b2 << 16) | (rc << 24))[None]
        return state

    st = jax.lax.fori_loop(0, TC, step, state_scr[:])
    state_scr[:] = st

    @pl.when(g == NT - 1)
    def _flush():
        states_ref[:] = state_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "NT", "Msr", "log2m",
                                    "interpret"))
def _call(wa, n, t1, t2, t3, *, S, R, TC, NT, Msr, log2m,
          interpret=False):
    out, states = pl.pallas_call(
        functools.partial(_kernel, S=S, R=R, TC=TC, NT=NT, Msr=Msr,
                          log2m=log2m),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, TC, R, 128), lambda g: (NT - 1 - g, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # wa
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec(memory_space=pltpu.VMEM),          # t1
            pl.BlockSpec(memory_space=pltpu.VMEM),          # t2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # t3
        ],
        out_specs=(
            pl.BlockSpec((1, TC, R, 128), lambda g: (NT - 1 - g, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # packed words
            pl.BlockSpec(memory_space=pltpu.VMEM),          # final states
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NT, TC, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((R, 128), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((R, 128), jnp.int32)],
        interpret=interpret,
    )(wa, jnp.asarray([[n]], jnp.int32), t1, t2, t3)
    return out.reshape(NT * TC, S), states.reshape(S)


def _pad_rows(arr_u32: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, 128), dtype=np.int32)
    flat = arr_u32.view(np.int32).reshape(-1)
    out.reshape(-1)[: len(flat)] = flat
    return out


def encode_scan(mapped_ts, nb_ts, n, et, *, S, T, TC=128,
                interpret=False):
    """Run the encode scan; returns (packed words (T_pad, S) i32 device,
    final states (S,) u32 device, T_pad).

    mapped_ts/nb_ts: (T, S) u32 device arrays (staged symbols).
    """
    import jax.numpy as jnp
    sigma = len(et.freq)
    Msr = -(-sigma // 128)
    NT = -(-T // TC)
    T_pad = NT * TC
    R = S // 128
    del nb_ts  # placement reads exception counts separately
    wa = jnp.pad(mapped_ts.astype(jnp.int32),
                 ((0, T_pad - T), (0, 0))).reshape(NT, TC, R, 128)
    t1 = (et.freq.astype(np.uint32) << 16) | et.base.astype(np.uint32)
    out, states = _call(
        wa, n,
        jnp.asarray(_pad_rows(t1, Msr)),
        jnp.asarray(_pad_rows(et.magic.astype(np.uint32), Msr)),
        jnp.asarray(_pad_rows(et.mlog2.astype(np.uint32), Msr)),
        S=S, R=R, TC=TC, NT=NT, Msr=Msr, log2m=et.log2m,
        interpret=interpret)
    return out, states, T_pad
