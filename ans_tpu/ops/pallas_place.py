"""Pallas TPU placement kernel: packed scan words -> the final lockstep
per-round stream (fmt 2), with no scatter and no large gathers.

XLA's scatter AND large gathers lower to ~20ns/element serial loops on
TPU, so the count-then-place compaction is rebuilt from vector
primitives only — and BATCHED over G steps per grid invocation, because
the LSB-first routing network's round count grows only logarithmically
with the window while the work per round vectorizes perfectly: routing
G steps at once costs log2(G*6S) rounds instead of G*log2(6S), so the
per-symbol instruction count (the round-1 bottleneck; kernels here are
issue-bound, not FLOP-bound) drops by ~G/log-factor.

Pipeline per G-step batch:

  1. round masks for all G steps -> ranks via one batched prefix sum
     (pallas_decode._prefixc over G*CH channels), channel bases via a
     log-step row scan: every byte's target position in the batch slab;
  2. ORDER-PRESERVING COMPACTION by an LSB-first routing network: each
     active byte moves left by delta = source - target in log2(G*6S)
     rounds of conditional power-of-two shifts.  Source order
     (step, channel, row, lane) matches target order (step, channel,
     rank), so the compaction is monotone and LSB-first routing is
     collision-free (validated by equivalence tests against the XLA
     scatter placement);
  3. the same router compacts the packed words (targets f/4) after the
     4-byte word assembly, with compile-time-baked take masks (the word
     compaction is a fixed permutation);
  4. the slab is byte-aligned to the running cursor with power-of-two
     conditional shifts and OR-merged into the section's stream block.

Element encoding during routing: w = delta << 8 | byte (i32); inactive
slots are negative (delta = -1), so `w >> 8` (arithmetic) recovers the
delta and `w & 0xFF` the byte at every stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _prefixc

_lsr = jax.lax.shift_right_logical
_NEG = -256


def _flatshift_fwd(w, d, B):
    """out[f] = w[f + d] over the row-major flat order of (B,128);
    out-of-range reads become _NEG.  d is a power of two."""
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    if d >= 128:
        dr = d // 128
        if dr >= B:
            return jnp.full((B, 128), _NEG, jnp.int32)
        a = pltpu.roll(w, B - dr, axis=0)      # circular left by dr
        return jnp.where(row < B - dr, a, _NEG)
    a = pltpu.roll(w, 128 - d, axis=1)         # circular left by d
    c = pltpu.roll(a, B - 1, axis=0)           # next row
    out = jnp.where(lane < 128 - d, a, c)
    oob = (row == B - 1) & (lane >= 128 - d)
    return jnp.where(oob, _NEG, out)


def _flatshift_back0(w, d, B):
    """out[f] = w[f - d], zero-filled (for word alignment)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    if d >= 128:
        dr = d // 128
        a = pltpu.roll(w, dr, axis=0)
        return jnp.where(row >= dr, a, 0)
    a = pltpu.roll(w, d, axis=1)
    c = pltpu.roll(a, 1, axis=0)
    out = jnp.where(lane >= d, a, c)
    oob = (row == 0) & (lane < d)
    return jnp.where(oob, 0, out)


def _route(w, rounds, B):
    """LSB-first collision-free compaction of delta<<8|byte words."""
    for k in range(rounds):
        inc = _flatshift_fwd(w, 1 << k, B)
        take = (inc >= 0) & (((inc >> (8 + k)) & 1) == 1)
        leave = (w >= 0) & (((w >> (8 + k)) & 1) == 1)
        w = jnp.where(take, inc - (1 << (8 + k)),
                      jnp.where(leave, _NEG, w))
    return w


@functools.lru_cache(maxsize=None)
def _static_pack_maskword(B: int, rounds: int):
    """The word compaction (flat position 4k -> k) is data-independent,
    so the LSB-first router's take masks are compile-time constants:
    simulate the routing on indices once and bake them, with bit k of
    the word holding round k's take mask (passed as a kernel input —
    pallas kernels cannot capture array constants)."""
    N = B * 128
    delta = np.full(N, -1, dtype=np.int64)
    act = np.arange(0, N, 4)
    delta[act] = act - act // 4
    word = np.zeros(N, dtype=np.int32)
    for k in range(rounds):
        d = 1 << k
        srcp = np.arange(N) + d
        inc = np.where(srcp < N, delta[np.minimum(srcp, N - 1)], -1)
        take = (inc >= 0) & (((inc >> k) & 1) == 1)
        leave = (delta >= 0) & (((delta >> k) & 1) == 1)
        delta = np.where(take, inc - d, np.where(leave, -1, delta))
        word |= take.astype(np.int32) << k
    return word.reshape(B, 128)


def _interleave(parts, G, R):
    """parts: CH arrays (G*R,128) -> (G*CH*R,128) in (g, ch, r) order
    (target stream order is step-major, then channel, then rank)."""
    CH = len(parts)
    if CH == 1:
        return parts[0]
    arrs = [p.reshape(G, 1, R, 128) for p in parts]
    return jnp.concatenate(arrs, axis=1).reshape(G * CH * R, 128)


def _row_excl_prefix(x, C):
    """Exclusive prefix over the rows of a (C,128) array (log-step row
    rolls); returns (exclusive rows (C,128), total (1,128))."""
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 128), 0)
    inc = x
    d = 1
    while d < C:
        inc = inc + jnp.where(row >= d, pltpu.roll(inc, d, axis=0), 0)
        d *= 2
    return inc - x, inc[C - 1:C]


def _kernel(n_ref, packed_ref, nb_ref, excw_ref, pmask_ref, out_ref,
            cur_scr, *, S, R, G, T_SEC, SWr, WIN, NR, NE):
    sec = pl.program_id(0)
    bi = pl.program_id(1)
    CH = NR + NE
    B = G * CH * R
    RB = max(1, (G * CH * S - 1).bit_length())  # routing rounds

    @pl.when(bi == 0)
    def _new_section():
        out_ref[0] = jnp.zeros((SWr, 128), jnp.int32)
        cur_scr[:] = jnp.zeros((1, 128), jnp.int32)

    n_val = n_ref[0, 0]
    rowGR = jax.lax.broadcasted_iota(jnp.int32, (G * R, 128), 0)
    laneGR = jax.lax.broadcasted_iota(jnp.int32, (G * R, 128), 1)
    logR = R.bit_length() - 1
    t0 = sec * T_SEC + bi * G
    elem = ((t0 + (rowGR >> logR)) * S
            + (rowGR & (R - 1)) * 128 + laneGR)
    valid = elem < n_val

    pk = packed_ref[0].reshape(G * R, 128)
    nb = jnp.where(valid, nb_ref[0].reshape(G * R, 128), 0)
    excw = excw_ref[0].reshape(G * R, 128)
    rc = jnp.where(valid, _lsr(pk, 24) & 3, 0)

    ms = [(rc > j).astype(jnp.int32) for j in range(NR)]
    ms += [(nb > j).astype(jnp.int32) for j in range(NE)]
    m6 = _interleave(ms, G, R)                          # (B,128)
    rank, chan_tot = _prefixc(m6, R, G * CH)
    bases_x, batch_tot = _row_excl_prefix(chan_tot, G * CH)
    pos = jnp.repeat(bases_x, R, axis=0) + rank         # (B,128)
    # decode-order bytes: renorm rounds read emission slots high-first
    b0 = pk & 0xFF
    b1 = _lsr(pk, 8) & 0xFF
    b2 = _lsr(pk, 16) & 0xFF
    rparts = [jnp.where(rc == 3, b2, jnp.where(rc == 2, b1, b0)),
              jnp.where(rc == 3, b1, b0), b0][:NR]
    eparts = [_lsr(excw, 8 * jnp.maximum(nb - 1, 0)) & 0xFF,
              _lsr(excw, 8 * jnp.maximum(nb - 2, 0)) & 0xFF,
              excw & 0xFF][:NE]
    bytes6 = _interleave(rparts + eparts, G, R)         # (B,128)

    rowB = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    laneB = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    flatB = rowB * 128 + laneB
    delta = flatB - pos
    w = jnp.where(m6 > 0, (delta << 8) | bytes6, _NEG)
    w = _route(w, RB, B)
    byte = jnp.where((w >= 0) & ((w >> 8) == 0), w & 0xFF, 0)
    # pack 4 consecutive flat bytes into a word, then compact the
    # words (targets f/4) with the baked-constant router
    s1 = _flatshift_fwd(byte, 1, B) & 0xFF
    s2 = _flatshift_fwd(byte, 2, B) & 0xFF
    s3 = _flatshift_fwd(byte, 3, B) & 0xFF
    wfull = byte | (s1 << 8) | (s2 << 16) | (s3 << 24)
    payload = wfull
    pmask = pmask_ref[:]
    for k in range(RB):
        cm = ((pmask >> k) & 1) == 1
        payload = jnp.where(cm, _flatshift_fwd(payload, 1 << k, B),
                            payload)
    # zero everything past the batch's word count (stale copies)
    cursor = cur_scr[:]
    nwords = _lsr(batch_tot + 3, 2)                     # (1,128)
    words = jnp.where(flatB < jnp.broadcast_to(nwords, (B, 128)),
                      payload, 0)
    # byte-align to the cursor
    bal = cursor & 3                                    # (1,128)
    balB = jnp.broadcast_to(bal, (B, 128))
    wprev = _flatshift_back0(words, 1, B)
    aligned = jnp.where(
        balB == 0, words,
        (words << (8 * balB)) | _lsr(wprev, 32 - 8 * balB))
    # lane/row alignment: shift words forward by lam = (cur>>2) & 127
    lam = jnp.broadcast_to(_lsr(cursor, 2) & 127, (B, 128))
    sh = aligned
    for kb in range(7):
        cond = ((lam >> kb) & 1) == 1
        sh = jnp.where(cond, _flatshift_back0(sh, 1 << kb, B), sh)
    # merge the first WIN rows into the stream at row0
    row0 = _lsr(cursor[0, 0], 9)
    win = out_ref[0, pl.ds(row0, WIN), :]
    out_ref[0, pl.ds(row0, WIN), :] = win | sh[:WIN]
    cur_scr[:] = cursor + batch_tot


@functools.partial(jax.jit,
                   static_argnames=("S", "R", "G", "T_SEC", "NSEC",
                                    "NTB", "SWr", "WIN", "NR", "NE",
                                    "interpret"))
def _call(packed4, nb4, excw4, n, *, S, R, G, T_SEC, NSEC, NTB, SWr,
          WIN, NR=3, NE=3, interpret=False):
    nb_grid = T_SEC // G
    B = G * (NR + NE) * R
    RB = max(1, (G * (NR + NE) * S - 1).bit_length())
    out = pl.pallas_call(
        functools.partial(_kernel, S=S, R=R, G=G, T_SEC=T_SEC,
                          SWr=SWr, WIN=WIN, NR=NR, NE=NE),
        grid=(NSEC, nb_grid),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, G, R, 128),
                         lambda s, b, nbg=nb_grid: (s * nbg + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, 128),
                         lambda s, b, nbg=nb_grid: (s * nbg + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, R, 128),
                         lambda s, b, nbg=nb_grid: (s * nbg + b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),      # pack masks
        ],
        out_specs=pl.BlockSpec((1, SWr, 128), lambda s, b: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSEC, SWr, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.int32)],
        interpret=interpret,
    )(jnp.asarray([[n]], jnp.int32), packed4, nb4, excw4,
      jnp.asarray(_static_pack_maskword(B, RB)))
    return out


def cap_batch_g(G: int, NR: int, NE: int, S: int) -> int:
    """Largest batch factor whose slab fits scoped VMEM: the kernel
    holds ~8-10 live (G*CH*R, 128) i32 slabs; B = 2560 rows (S=4096,
    G=16, CH=5) is the measured-good envelope — S=8192 at G=16 doubles
    it and OOMs, so trade batch amortization for rows (round count only
    grows with log2(G*CH*S)).  ONE owner for the constant: the block
    runtime calls this too."""
    while G > 2 and G * (NR + NE) * (S // 128) > 2560:
        G //= 2
    return G


def place(packed, nb_ts, excb_ts, n, *, S, T, t_sec, sec_len,
          NR=3, NE=3, G=None, tc_max=None, interpret=False):
    """Host wrapper: stage inputs per (section, batch), run the kernel,
    return the packed stream sections as a device (NSEC, SWr, 128) i32
    array (bytes in row-major little-endian word order).

    packed: (T, S) i32 device (pallas_encode scan output, sliced to T)
    nb_ts:  (T, S) u32 device;  excb_ts: (T, S, 3) u8 device
    """
    del tc_max  # kept for API compat; superseded by G batching
    if G is None:
        G = cap_batch_g(16, NR, NE, S)
    while t_sec % G:
        G //= 2
    sec_len = np.asarray(sec_len, dtype=np.int64)
    NSEC = len(sec_len)
    R = S // 128
    CH = NR + NE
    WIN = -(-(G * CH * S) // 512) + 2
    sw_bytes = int(sec_len.max()) + WIN * 512
    sw_bytes = -(-sw_bytes // (128 * 1024)) * (128 * 1024)
    SWr = sw_bytes // 512
    T_stage = NSEC * t_sec
    NTB = T_stage // G

    def stage4(x):
        x = jnp.pad(x.astype(jnp.int32), ((0, T_stage - T), (0, 0)))
        return x.reshape(NTB, G, R, 128)

    excw = (excb_ts[..., 0].astype(jnp.int32)
            | (excb_ts[..., 1].astype(jnp.int32) << 8)
            | (excb_ts[..., 2].astype(jnp.int32) << 16))
    out = _call(stage4(packed), stage4(nb_ts.astype(jnp.int32)),
                stage4(excw), n, S=S, R=R, G=G, T_SEC=t_sec,
                NSEC=NSEC, NTB=NTB, SWr=SWr, WIN=WIN, NR=NR, NE=NE,
                interpret=interpret)
    return out


def sections_to_stream(out: np.ndarray, sec_len) -> np.ndarray:
    """Host: concatenate the per-section byte prefixes."""
    sec_len = np.asarray(sec_len, dtype=np.int64)
    parts = []
    for s in range(len(sec_len)):
        parts.append(out[s].reshape(-1).view(np.uint8)[: sec_len[s]])
    return np.concatenate(parts)
