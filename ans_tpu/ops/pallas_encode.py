"""Pallas TPU encode kernel for the lockstep S-lane rANS format (fmt 2).

Encode is a reverse-order scan with data-dependent byte emission.  The
placement (count-then-place compaction) lives in pallas_place.py; the
sequential scan is here, split into two phases per G-step batch:

  * BATCHED PREFETCH: the encoder-table lookups (freq/base and the
    Granlund-Montgomery division magic) depend only on the symbols, not
    on the states, so they are hoisted out of the sequential chain and
    performed once per batch on (G*R, 128) arrays — the per-instruction
    issue overhead that dominates thin vector ops is amortized over G
    steps.  The divide shift ceil(log2 f) is not a table at all: it is
    read off the float32 exponent of f-1 (exact for f <= 2^22).
  * THIN SEQUENTIAL CORE: per step only the state-dependent work runs
    (renormalization compares/shifts, the multiply-high division, the
    state update), all on (R, 128) registers resident in VMEM.

Per (step, lane) it emits one packed word r0 | r1<<8 | r2<<16 | rc<<24
(the <=3 renorm bytes low-byte-first and their count); pallas_place
turns those words plus the exception-byte arrays into the final stream.

Frames up to 2^22 are supported: M <= 2^16 packs freq<<16|base in one
table word; larger frames use separate freq/base tables (the reference
splits decode entries by table size for the same reason,
ans_int.hpp:106-161).

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

from .pallas_decode import (_PLANE_LOOP_MIN_ROWS, _lookup_acc,
                            _lookup_loop, _lookup_multi)
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


def _plane_lookup_acc(rows_arr, idx, nrows, bits, B):
    """Bit-packed plane read (ops/grouped.Plane).  Large planes take a
    VMEM ref and the bounded-stack fori_loop scan (the Mosaic kernel
    stack gives every unrolled program point its own slot, so the
    chunk-accumulated unrolled scan still OOMs at sigma-sized planes —
    see pallas_decode._lookup_loop); small ones a materialized value
    and the pipelined unrolled scan."""
    per = 32 // bits
    widx = _lsr(idx, per.bit_length() - 1)
    if nrows > _PLANE_LOOP_MIN_ROWS:
        word = _lookup_loop(rows_arr, widx, nrows, B)
    else:
        word = _lookup_acc(rows_arr, widx, nrows, B)
    sh = (idx & (per - 1)) * bits
    return _lsr(word, sh) & ((1 << bits) - 1)


def _take1(row, idx, B):
    return jnp.take_along_axis(jnp.broadcast_to(row, (B, 128)), idx,
                               axis=1)


def _kernel(wa_ref, n_ref, t1_ref, t2_ref, tb_ref, *rest, S, R, TC, NT,
            G, Msr, log2m, big_m, grouped=False, gdepth=0, gprows=(),
            vrspec=()):
    """grouped=False: value-indexed tables (t1 freq<<16|base or split
    freq / t2 magic / tb base).  grouped=True: rank-space group tables
    (t1 g_f / t2 g_magic / tb g_slot0) + rank-boundary pivot levels in
    rest; base(rank) = g_slot0 + (rank - g_rank0)*f with g found by
    binary search (ops/grouped.py).  vrspec: optional bit-packed
    value->rank planes applied to the input symbols first (device-mapped
    alphabets like ans_msb that never pass through the host)."""
    gpiv_refs = rest[:gdepth]
    vr_refs = rest[gdepth:gdepth + len(vrspec)]
    out_ref, states_ref, state_scr = rest[gdepth + len(vrspec):]
    gid = pl.program_id(0)
    chunk = NT - 1 - gid                # walk chunks backwards

    @pl.when(gid == 0)
    def _init():
        state_scr[:] = jnp.full((R, 128), A_L, jnp.int32)

    lane_global = (jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0) * 128
                   + jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1))
    n_val = n_ref[0, 0]
    t1 = t1_ref[:]
    t2 = t2_ref[:]
    tb = tb_ref[:] if (big_m or grouped) else None
    gpivs = [p[:] for p in gpiv_refs]
    # large value->rank planes stay refs for the fori_loop scan
    vrs = [p if spec[1] > _PLANE_LOOP_MIN_ROWS else p[:]
           for p, spec in zip(vr_refs, vrspec)]
    NB = TC // G

    def batch(bi, state):
        rb = NB - 1 - bi                # batches walk backwards
        blk = wa_ref[0, pl.ds(rb * G, G)]          # (G, R, 128)
        syms = blk.reshape(G * R, 128) & ((1 << 24) - 1)
        if vrspec:
            rk = jnp.zeros((G * R, 128), jnp.int32)
            for vref, (bits, rows, shift) in zip(vrs, vrspec):
                rk = rk | (_plane_lookup_acc(vref, syms, rows, bits,
                                             G * R) << shift)
            syms = rk
        if grouped:
            # group-of-rank search; lb tracks g_rank0[m] for free
            m = jnp.zeros((G * R, 128), jnp.int32)
            lbr = jnp.zeros((G * R, 128), jnp.int32)
            for k in range(gdepth - 1, -1, -1):
                if gprows[k] == 1:
                    pv = _take1(gpivs[k], m, G * R)
                else:
                    pv = _lookup(gpivs[k], m, gprows[k], G * R)
                take = syms >= pv
                m = m + m + take.astype(jnp.int32)
                lbr = jnp.where(take, pv, lbr)
            # g_f / g_magic / g_slot0 all read at the group id m: one
            # fused pass shares the idx decomposition + row compares
            fb, mg, s0 = _lookup_multi((t1, t2, tb), m, Msr, G * R)
            bb = s0 + (syms - lbr) * fb
        elif big_m:
            fb, bb, mg = _lookup_multi((t1, tb, t2), syms, Msr, G * R)
        else:
            # freq<<16|base and GM magic share the symbol index
            w1, mg = _lookup_multi((t1, t2), syms, Msr, G * R)
            fb = _lsr(w1, 16)
            bb = w1 & 0xFFFF
        # divide shift = max(ceil(log2 f) - 1, 0) = the f32 exponent of
        # f-1, clamped (exact: f-1 < 2^22 < 2^24)
        e = _lsr(pltpu.bitcast((fb - 1).astype(jnp.float32), jnp.int32),
                 23) - 127
        shb = jnp.maximum(e, 0)
        ubb = fb << (31 - log2m)

        words = [None] * G
        for gg in range(G - 1, -1, -1):            # steps walk backwards
            ri = rb * G + gg
            t = chunk * TC + ri
            valid = (t * S + lane_global) < n_val
            sl = slice(gg * R, (gg + 1) * R)
            f = fb[sl]
            base = bb[sl]
            magic = mg[sl]
            sh = shb[sl]
            ub = ubb[sl]
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
            # q = st / f via GM multiply-high (exact; f == 1 around)
            mh = _mulhi32(st, magic)
            q = _lsr(mh + _lsr(st - mh, 1), sh)
            q = jnp.where(f == 1, st, q)
            r = st - q * f
            newst = (q << log2m) + r + base
            state = jnp.where(valid, newst, state)
            words[gg] = b0 | (b1 << 8) | (b2 << 16) | (rc << 24)
        out_ref[0, pl.ds(rb * G, G)] = jnp.stack(words)
        return state

    st = jax.lax.fori_loop(0, NB, batch, state_scr[:])
    state_scr[:] = st

    @pl.when(gid == NT - 1)
    def _flush():
        states_ref[:] = state_scr[:]


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "TC", "NT", "G", "Msr",
                                    "log2m", "big_m", "grouped", "gdepth",
                                    "gprows", "vrspec", "interpret"))
def _call(wa, n, t1, t2, tb, *rest, S, R, TC, NT, G, Msr, log2m, big_m,
          grouped=False, gdepth=0, gprows=(), vrspec=(),
          interpret=False):
    out, states = pl.pallas_call(
        functools.partial(_kernel, S=S, R=R, TC=TC, NT=NT, G=G, Msr=Msr,
                          log2m=log2m, big_m=big_m, grouped=grouped,
                          gdepth=gdepth, gprows=gprows, vrspec=vrspec),
        grid=(NT,),
        in_specs=[
            pl.BlockSpec((1, TC, R, 128), lambda g: (NT - 1 - g, 0, 0, 0),
                         memory_space=pltpu.VMEM),          # wa
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),  # n
            pl.BlockSpec(memory_space=pltpu.VMEM),          # t1
            pl.BlockSpec(memory_space=pltpu.VMEM),          # t2
            pl.BlockSpec(memory_space=pltpu.VMEM),          # tb
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(rest),
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
    )(wa, jnp.asarray([[n]], jnp.int32), t1, t2, tb, *rest)
    return out.reshape(NT * TC, S), states.reshape(S)


def _pad_rows(arr_u32: np.ndarray, rows: int) -> np.ndarray:
    out = np.zeros((rows, 128), dtype=np.int32)
    flat = arr_u32.view(np.int32).reshape(-1)
    out.reshape(-1)[: len(flat)] = flat
    return out


def choose_g(sigma: int, S: int, log2m: int, TC: int = 128,
             G: int = 16) -> int:
    """Batch factor G for the scan: the batched prefetch materializes
    ceil(sigma/128) lane-shuffle terms per table over (G*R, 128) i32
    arrays, so G must shrink for large alphabets to keep the scoped
    VMEM stack under Mosaic's 16MB limit (measured OOM at 17.1MB for
    sigma=5120, G=16, S=2048, big_m)."""
    R = S // 128
    Msr = max(1, -(-sigma // 128))
    ntab = 3 if log2m > 16 else 2
    while G > 1 and Msr * G * R * 512 * ntab > (6 << 20):
        G //= 2
    while TC % G:
        G //= 2
    return G


def _cap_tc(TC: int, R: int) -> int:
    """Shrink the scan's chunk rows so the double-buffered wa + out
    blocks (4*TC*R*512 bytes together) leave stack room under Mosaic's
    16MB scoped-VMEM limit (S=8192/TC=128 measured 16.08M: over by
    81K)."""
    while TC > 8 and 4 * TC * R * 512 > (12 << 20):
        TC //= 2
    return TC


def encode_scan(mapped_ts, nb_ts, n, et, *, S, T, TC=128, G=None,
                interpret=False):
    """Run the encode scan; returns (packed words (T_pad, S) i32 device,
    final states (S,) u32 device, T_pad).

    mapped_ts/nb_ts: (T, S) u32 device arrays (staged symbols).
    """
    sigma = len(et.freq)
    Msr = -(-sigma // 128)
    R = S // 128
    TC = _cap_tc(TC, R)
    NT = -(-T // TC)
    T_pad = NT * TC
    G = choose_g(sigma, S, et.log2m, TC, 16 if G is None else G)
    del nb_ts  # placement reads exception counts separately
    wa = jnp.pad(mapped_ts.astype(jnp.int32),
                 ((0, T_pad - T), (0, 0))).reshape(NT, TC, R, 128)
    big_m = et.log2m > 16
    if big_m:
        t1 = et.freq.astype(np.uint32)
        tb = jnp.asarray(_pad_rows(et.base.astype(np.uint32), Msr))
    else:
        t1 = (et.freq.astype(np.uint32) << 16) | et.base.astype(np.uint32)
        tb = jnp.zeros((1, 128), jnp.int32)
    out, states = _call(
        wa, n,
        jnp.asarray(_pad_rows(t1, Msr)),
        jnp.asarray(_pad_rows(et.magic.astype(np.uint32), Msr)),
        tb,
        S=S, R=R, TC=TC, NT=NT, G=G, Msr=Msr, log2m=et.log2m,
        big_m=big_m, interpret=interpret)
    return out, states, T_pad


def encode_scan_grouped(syms_ts, n, layout, *, S, T, TC=128, G=None,
                        vr_planes=None, interpret=False):
    """Grouped-layout encode scan (ops/grouped.py): the per-symbol
    prefetch runs in RANK space, so table cost is bounded by the group
    count NG <= sqrt(2M) regardless of sigma.

    syms_ts: (T, S) device array of RANKS (host-remapped), or of raw
    mapped symbols when vr_planes (ops/grouped.pack_planes of
    layout.rank_of) is given — the kernel then applies the value->rank
    planes itself (device-mapped alphabets like ans_msb).
    """
    NG = layout.num_groups
    NGr = max(1, -(-NG // 128))
    R = S // 128
    TC = _cap_tc(TC, R)
    NT = -(-T // TC)
    T_pad = NT * TC
    vr_planes = vr_planes or ()
    vrspec = tuple((p.bits, p.rows, p.shift) for p in vr_planes)
    # VMEM budget: prefetch materializes ~3 NGr-row lookups + gdepth
    # probe levels over (G*R,128); vr planes are chunk-accumulated (live
    # ~16 rows).  Reuse choose_g with an effective row count.
    eff_rows = 3 * NGr + sum(min(r, 16) for _, r, _ in vrspec) + 16
    G = choose_g(eff_rows * 128, S, layout.log2m, TC,
                 16 if G is None else G)
    wa = jnp.pad(syms_ts.astype(jnp.int32),
                 ((0, T_pad - T), (0, 0))).reshape(NT, TC, R, 128)
    gprows, gpivs = [], []
    for p in layout.rank_pivots:
        r = max(1, -(-len(p) // 128))
        gprows.append(r)
        gpivs.append(jnp.asarray(_pad_rows(np.ascontiguousarray(p), r)))
    rest = tuple(gpivs) + tuple(
        jnp.asarray(_pad_rows(p.words.astype(np.uint32), p.rows))
        for p in vr_planes)
    out, states = _call(
        wa, n,
        jnp.asarray(_pad_rows(layout.g_f.astype(np.uint32), NGr)),
        jnp.asarray(_pad_rows(layout.g_magic.astype(np.uint32), NGr)),
        jnp.asarray(_pad_rows(layout.g_slot0.astype(np.uint32), NGr)),
        *rest,
        S=S, R=R, TC=TC, NT=NT, G=G, Msr=NGr, log2m=layout.log2m,
        big_m=False, grouped=True, gdepth=layout.rank_depth,
        gprows=tuple(gprows), vrspec=vrspec, interpret=interpret)
    return out, states, T_pad
