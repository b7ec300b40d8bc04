"""Pallas TPU kernels for the variable-length byte splitters
(vbyte / streamvbyte).

The XLA versions (ops/bytesplit.py) lower their scatter/gather to
~20ns/element serial loops on TPU — measured 27M ints/s encode and
6-11M decode on a v5e, 40-200x below the reference's C libraries
(reference: include/methods.hpp:38-102, FastPFor VariableByte +
lemire/streamvbyte at 1.1-1.3e9 ints/s).  These kernels rebuild both
codecs from the shuffle/roll primitives that actually vectorize on TPU:

  ENCODE (shared, K = 4 svb / 5 vbyte): the wire format is an
  element-major byte stream, so byte j of element i targets position
  start[i] + j where start is the prefix sum of the per-element byte
  counts.  Per section of E elements:
    1. byte lengths from unsigned threshold compares, one in-VMEM
       prefix-sum network -> start[i];
    2. STATIC K-PHASE EXPANSION: flat slot F = K*i + j is row-mapped as
       F = 128*(K*r + g) + m, so slot (g, m) reads element lane
       (128g + m) // K with byte index (128g + m) % K — a compile-time
       lane shuffle per output phase g (no gather);
    3. the LSB-first routing network from pallas_place compacts the
       active slots (delta = F - target is monotone, so routing is
       collision-free), then the baked-mask word router packs bytes
       into u32 words.
  Sections are independent (byte-aligned at their own start); the host
  concatenates the true-length prefixes.

  DECODE (svb): lengths come from the control bytes, so decode needs no
  search at all: an XLA pass turns control bytes into per-step stream
  offsets (cumsum, no gather), and the kernel then processes S = 2048
  elements per step: expand the step's 128 control words to per-element
  keys (one static shuffle), prefix-sum to in-step offsets, ONE batched
  window lookup for all 4 byte channels (pallas_decode._lookup), and a
  masked shift-or merge.  Steps are independent — the offset table
  removes the sequential cursor the ANS decoder needs.

  DECODE (vbyte) is in-stream self-delimiting (continuation bits), so
  element boundaries require a scan: see vbyte_decode_kernel below —
  terminator prefix-sums over the window recover e(p) (owning element)
  and j(p) (byte index), and the REVERSED routing network expands each
  byte right to slot 5*e(p) + j(p); a static collapse + shift-or merge
  rebuilds the values.  The cursor advances by the count of bytes owned
  by the step's elements, carried across the sequential grid.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_decode import _lookup, _prefixc
from .pallas_place import (_NEG, _flatshift_fwd, _route,
                           _static_pack_maskword)

_lsr = jax.lax.shift_right_logical


# --------------------------------------------------------------------------
# static K-phase expansion / collapse
# --------------------------------------------------------------------------

def _div_k(x, K: int):
    """Exact x // K for 0 <= x < 5120, K in {1..5}, as vector ops
    (pallas kernels cannot capture array constants, so index patterns
    are computed from iotas; division by 3/5 is a multiply-shift)."""
    if K == 1:
        return x
    if K == 2:
        return _lsr(x, 1)
    if K == 3:
        return _lsr(x * 2731, 13)  # exact for x < 8192
    if K == 4:
        return _lsr(x, 2)
    return _lsr(x * 205, 10)


def _phase_idx(K: int, g: int, shape):
    """(lane index, byte index) rows for expansion phase g: flat slot
    F = 128*(K*r + g) + m holds element (128g + m) // K byte
    (128g + m) % K."""
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    f = 128 * g + lane
    l_idx = _div_k(f, K)
    return l_idx, f - K * l_idx


def _expand(part, K, ER):
    """(ER,128) -> (K*ER,128): flat[K*i + j] = part[i] (j-independent
    payload; the caller combines with the static jE pattern)."""
    outs = []
    for g in range(K):
        l_idx, _ = _phase_idx(K, g, part.shape)
        outs.append(jnp.take_along_axis(part, l_idx, axis=1))
    return jnp.stack(outs, axis=1).reshape(K * ER, 128)


def _expand_j(K, ER):
    """Static byte-index pattern jE for the expanded layout."""
    rows = []
    for g in range(K):
        _, j_idx = _phase_idx(K, g, (ER, 128))
        rows.append(j_idx)
    return jnp.stack(rows, axis=1).reshape(K * ER, 128)


def _collapse(E, K, ER):
    """(K*ER,128) -> K arrays (ER,128): parts[j][i] = E[K*i + j]
    (value slot (j, l) reads phase (K*l + j) >> 7, lane
    (K*l + j) & 127)."""
    E5 = E.reshape(ER, K, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ER, 128), 1)
    parts = []
    for j in range(K):
        f = K * lane + j
        g_idx = _lsr(f, 7)
        m_idx = f & 127
        acc = None
        for g in range(K):
            shuf = jnp.take_along_axis(E5[:, g, :], m_idx, axis=1)
            term = jnp.where(g_idx == g, shuf, 0)
            acc = term if acc is None else acc | term
        parts.append(acc)
    return parts


def _uge(x, c: int):
    """Unsigned x >= c for i32 bit patterns, c < 2^31."""
    return (x < 0) | (x >= c)


# --------------------------------------------------------------------------
# encode kernel (vbyte + streamvbyte)
# --------------------------------------------------------------------------

def _enc_kernel(n_ref, x_ref, pmask_ref, out_ref, tot_ref, *,
                K, E, ER, SWr, vbyte):
    sec = pl.program_id(0)
    x = x_ref[0]                                       # (ER,128) i32
    row = jax.lax.broadcasted_iota(jnp.int32, (ER, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ER, 128), 1)
    i_flat = row * 128 + lane
    valid = (sec * E + i_flat) < n_ref[0, 0]
    if vbyte:
        ln = (1 + _uge(x, 1 << 7) + _uge(x, 1 << 14)
              + _uge(x, 1 << 21) + _uge(x, 1 << 28))
    else:
        ln = (1 + _uge(x, 1 << 8) + _uge(x, 1 << 16)
              + _uge(x, 1 << 24))
    ln = jnp.where(valid, ln.astype(jnp.int32), 0)
    start, tot = _prefixc(ln, ER, 1)                   # excl prefix

    B = K * ER
    rowB = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    laneB = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    flatF = rowB * 128 + laneB
    jE = _expand_j(K, ER)
    xE = _expand(x, K, ER)
    lnE = _expand(ln, K, ER)
    startE = _expand(start, K, ER)
    active = jE < lnE
    if vbyte:
        byte = (_lsr(xE, 7 * jE) & 0x7F) | jnp.where(
            jE + 1 < lnE, 0x80, 0)
    else:
        byte = _lsr(xE, 8 * jE) & 0xFF
    delta = flatF - (startE + jE)
    w = jnp.where(active, (delta << 8) | byte, _NEG)
    RB = max(1, (K * E - 1).bit_length())
    w = _route(w, RB, B)
    byte = jnp.where((w >= 0) & ((w >> 8) == 0), w & 0xFF, 0)
    s1 = _flatshift_fwd(byte, 1, B) & 0xFF
    s2 = _flatshift_fwd(byte, 2, B) & 0xFF
    s3 = _flatshift_fwd(byte, 3, B) & 0xFF
    payload = byte | (s1 << 8) | (s2 << 16) | (s3 << 24)
    pmask = pmask_ref[:]
    for k in range(RB):
        cm = ((pmask >> k) & 1) == 1
        payload = jnp.where(cm, _flatshift_fwd(payload, 1 << k, B),
                            payload)
    nwords = _lsr(tot + 3, 2)                          # (1,128)
    words = jnp.where(flatF < jnp.broadcast_to(nwords, (B, 128)),
                      payload, 0)
    out_ref[0] = words[:SWr]
    tot_ref[0] = tot


@functools.partial(jax.jit,
                   static_argnames=("K", "E", "ER", "NSEC", "SWr",
                                    "vbyte", "interpret"))
def _enc_call(x3, n, *, K, E, ER, NSEC, SWr, vbyte, interpret=False):
    B = K * ER
    RB = max(1, (K * E - 1).bit_length())
    out, tot = pl.pallas_call(
        functools.partial(_enc_kernel, K=K, E=E, ER=ER, SWr=SWr,
                          vbyte=vbyte),
        grid=(NSEC,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ER, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, SWr, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((NSEC, SWr, 128), jnp.int32),
            jax.ShapeDtypeStruct((NSEC, 1, 128), jnp.int32),
        ),
        interpret=interpret,
    )(jnp.asarray([[n]], jnp.int32), x3,
      jnp.asarray(_static_pack_maskword(B, RB)))
    return out, tot


def split_encode(x, n: int, *, vbyte: bool, E: int = 1 << 15,
                 interpret: bool = False):
    """x: (n,) u32 device/host.  Returns (sections (NSEC, SWr, 128) i32
    device, per-section byte totals (NSEC,) host).  Stream = concat of
    out[s].view(u8)[:totals[s]].

    E = 2^15 is the VMEM ceiling AND the speed optimum on v5e: the
    router keeps ~4 (K*E/128, 128) i32 arrays live per round, so
    K=5 at E=2^16 needs 22.7MB scoped vmem (>16MB); measured E-sweep
    (zipf n=2^25): 2^14 92-101M, 2^15 105M+/best, 2^16 94M/OOM."""
    K = 5 if vbyte else 4
    NSEC = max(1, -(-n // E))
    ER = E // 128
    SWr = -(-(K * E) // 512) + 1
    pad = NSEC * E - n
    x3 = jnp.pad(jnp.asarray(x).astype(jnp.int32), (0, pad)).reshape(
        NSEC, ER, 128)
    out, tot = _enc_call(x3, n, K=K, E=E, ER=ER, NSEC=NSEC, SWr=SWr,
                         vbyte=vbyte, interpret=interpret)
    return out, np.asarray(tot[:, 0, 0])


def sections_to_bytes(out, totals) -> np.ndarray:
    host = np.asarray(out)
    parts = [host[s].reshape(-1).view(np.uint8)[: int(totals[s])]
             for s in range(len(totals))]
    return np.concatenate(parts)


@jax.jit
def svb_control(x):
    """Control bytes for streamvbyte via XLA (fixed-size, no routing):
    returns (ceil(n/4),) u8."""
    x = x.astype(jnp.uint32)
    n = x.shape[0]
    key = ((x > 0xFF).astype(jnp.uint32) + (x > 0xFFFF)
           + (x > 0xFFFFFF))
    nc = -(-n // 4)
    k4 = jnp.zeros((nc * 4,), jnp.uint32).at[: n].set(key).reshape(nc, 4)
    return (k4[:, 0] | (k4[:, 1] << 2) | (k4[:, 2] << 4)
            | (k4[:, 3] << 6)).astype(jnp.uint8)


# --------------------------------------------------------------------------
# streamvbyte decode kernel
# --------------------------------------------------------------------------

_S_DEC = 2048                       # elements per step (fixed: 1 control
_R_DEC = _S_DEC // 128              # row of 128 words = 2048 keys)


def _svb_dec_kernel(n_ref, off_ref, ctl_ref, stream_ref, out_ref, *,
                    T_SEC, SWr, WR):
    sec = pl.program_id(0)
    S, R = _S_DEC, _R_DEC
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    widx = row * (128 // 16) + _lsr(lane, 4)           # ctl word per elem
    shft = 2 * (lane & 15)                             # key slot in word
    n_val = n_ref[0, 0]

    def step(t, _):
        cursor = off_ref[0, 0, t]
        ctl_row = ctl_ref[0, pl.ds(t, 1), :]           # (1,128)
        cw = jnp.take_along_axis(
            jnp.broadcast_to(ctl_row, (R, 128)), widx, axis=1)
        key = _lsr(cw, shft) & 3
        valid = ((sec * T_SEC + t) * S + row * 128 + lane) < n_val
        ln = jnp.where(valid, key + 1, 0)
        rank, _ = _prefixc(ln, R, 1)
        row0 = cursor >> 9
        win = stream_ref[0, pl.ds(row0, WR), :]
        base = cursor - (row0 << 9)
        bp = jnp.concatenate([base + rank + j for j in range(4)],
                             axis=0)                   # (4R,128)
        wv = _lookup(win, _lsr(bp, 2), WR, 4 * R)
        byte = _lsr(wv, (bp & 3) * 8) & 0xFF
        val = jnp.zeros((R, 128), jnp.int32)
        for j in range(4):
            val = val | jnp.where(j < ln,
                                  byte[j * R:(j + 1) * R] << (8 * j), 0)
        out_ref[0, pl.ds(t, 1)] = pltpu.bitcast(val, jnp.uint32)[None]
        return 0

    jax.lax.fori_loop(0, T_SEC, step, 0)


@functools.partial(jax.jit,
                   static_argnames=("T_SEC", "NSEC", "CWr", "SWr", "WR",
                                    "interpret"))
def _svb_dec_call(off2, ctl3, stream3, n, *, T_SEC, NSEC, CWr, SWr, WR,
                  interpret=False):
    out = pl.pallas_call(
        functools.partial(_svb_dec_kernel, T_SEC=T_SEC, SWr=SWr, WR=WR),
        grid=(NSEC,),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T_SEC), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, CWr, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SWr, 128), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T_SEC, _R_DEC, 128),
                               lambda s: (s, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NSEC, T_SEC, _R_DEC, 128),
                                       jnp.uint32),
        interpret=interpret,
    )(jnp.asarray([[n]], jnp.int32), off2, ctl3, stream3)
    return out.reshape(NSEC * T_SEC, _S_DEC)


@functools.partial(jax.jit, static_argnames=("T", "S"))
def _svb_offsets(ctl, n, *, T, S):
    """Per-step byte offsets (T+1,) from the control bytes (cumsum of
    per-step length sums; no gather)."""
    c = ctl.astype(jnp.int32)
    k = jnp.stack([c & 3, (c >> 2) & 3, (c >> 4) & 3, (c >> 6) & 3],
                  axis=-1).reshape(-1)
    ln = jnp.where(jnp.arange(k.shape[0]) < n, k + 1, 0)
    ln = jnp.pad(ln, (0, T * S - k.shape[0]))
    per_step = ln.reshape(T, S).sum(axis=1)
    return jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(per_step).astype(jnp.int32)])


def svb_stage(control: np.ndarray, data: np.ndarray, n: int, *,
              T_SEC: int = 256, interpret: bool = False):
    """Stage the streamvbyte decode inputs; returns (args, kwargs) for
    _svb_dec_call (PreparedDecoder-style: stage once, run many)."""
    S = _S_DEC
    T = -(-n // S)
    NSEC = -(-T // T_SEC)
    off = np.asarray(_svb_offsets(jnp.asarray(control), n,
                                  T=NSEC * T_SEC, S=S))
    sec_base = off[np.arange(NSEC) * T_SEC]
    sec_len = np.diff(np.append(sec_base, off[-1]))
    WR = -(-(4 * S + 512) // 512) + 1
    sw = int(sec_len.max()) + WR * 512
    sw = -(-sw // (128 * 1024)) * (128 * 1024)
    mat = np.zeros((NSEC, sw), dtype=np.uint8)
    for s in range(NSEC):
        mat[s, : sec_len[s]] = data[sec_base[s]: sec_base[s]
                                    + sec_len[s]]
    off2 = (off[: NSEC * T_SEC].reshape(NSEC, 1, T_SEC)
            - sec_base[:, None, None]).astype(np.int32)
    nc_pad = NSEC * T_SEC * (S // 4)
    ctl = np.zeros(nc_pad, dtype=np.uint8)
    ctl[: len(control)] = control
    ctl3 = ctl.view("<i4").reshape(NSEC, -1, 128)
    args = (jnp.asarray(off2), jnp.asarray(ctl3),
            jnp.asarray(mat.view("<i4").reshape(NSEC, -1, 128)), n)
    kw = dict(T_SEC=T_SEC, NSEC=NSEC, CWr=ctl3.shape[1],
              SWr=mat.shape[1] // 512, WR=WR, interpret=interpret)
    return args, kw


def svb_decode(control: np.ndarray, data: np.ndarray, n: int, *,
               T_SEC: int = 256, interpret: bool = False) -> np.ndarray:
    """streamvbyte decode through the Pallas kernel.  control: (nc,) u8;
    data: payload bytes u8.  Returns (>=n,) u32 (caller trims)."""
    args, kw = svb_stage(control, data, n, T_SEC=T_SEC,
                         interpret=interpret)
    return _svb_dec_call(*args, **kw)


# --------------------------------------------------------------------------
# vbyte decode kernel
# --------------------------------------------------------------------------
#
# vbyte is self-delimiting (continuation bits), so element boundaries
# come from the payload itself.  Per window of GD*S elements:
#   1. DMA the next <= WIN rows from the HBM stream at the cursor;
#   2. unpack words to a flat byte domain; terminator mask = bit7 clear;
#   3. log-step scans recover, per byte p: e(p) = owning element
#      (prefix-sum of terminators) and its element start (prefix-max of
#      start markers), hence j(p) = byte index within the element;
#   4. the REVERSED routing network expands each owned byte RIGHT to
#      slot 5*e(p) + j(p) (deltas are monotone non-decreasing, so the
#      bit-serial router is collision-free — validated against the XLA
#      decoder in interpret mode);
#   5. static collapse -> per-j channels; masked shift-or merge;
#   6. cursor += number of owned bytes (sequential grid carry).


def _flatshift_back(w, d, B):
    """out[f] = w[f - d] over row-major flat order, _NEG-filled."""
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    if d >= 128:
        dr = d // 128
        if dr >= B:
            return jnp.full((B, 128), _NEG, jnp.int32)
        a = pltpu.roll(w, dr, axis=0)
        return jnp.where(row >= dr, a, _NEG)
    a = pltpu.roll(w, d, axis=1)
    c = pltpu.roll(a, 1, axis=0)
    out = jnp.where(lane >= d, a, c)
    oob = (row == 0) & (lane < d)
    return jnp.where(oob, _NEG, out)


def _route_right(w, rounds, B):
    """MSB-first collision-free EXPANSION of delta<<8|byte words (each
    moves right by delta; deltas monotone over source order).  The bit
    order is the mirror of the LSB-first compaction: LSB-first
    expansion clobbers (delta_a=1, delta_b=2 at adjacent sources
    collide after round 0), MSB-first is the time-reversal of the
    proven compaction and keeps every intermediate position unique."""
    for k in range(rounds - 1, -1, -1):
        inc = _flatshift_back(w, 1 << k, B)
        take = (inc >= 0) & (((inc >> (8 + k)) & 1) == 1)
        leave = (w >= 0) & (((w >> (8 + k)) & 1) == 1)
        w = jnp.where(take, inc - (1 << (8 + k)),
                      jnp.where(leave, _NEG, w))
    return w


def _expand_parts(parts, K, ER):
    """General K-interleave: flat[K*i + j] = parts[j][i]."""
    outs = []
    for g in range(K):
        l_idx, j_idx = _phase_idx(K, g, parts[0].shape)
        acc = None
        for j in range(K):
            shuf = jnp.take_along_axis(parts[j], l_idx, axis=1)
            term = jnp.where(j_idx == j, shuf, 0)
            acc = term if acc is None else acc | term
        outs.append(acc)
    return jnp.stack(outs, axis=1).reshape(K * ER, 128)


def _prefixmax(x, B):
    """Inclusive prefix-max over row-major flat order of (B,128)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 0)
    inc = x
    for d in (1, 2, 4, 8, 16, 32, 64):
        inc = jnp.maximum(inc, jnp.where(lane >= d,
                                         pltpu.roll(inc, d, axis=1),
                                         _NEG))
    rt = jnp.broadcast_to(inc[:, 127:128], (B, 128))  # row maxima
    rmax = rt
    d = 1
    while d < B:
        rmax = jnp.maximum(rmax, jnp.where(row >= d,
                                           pltpu.roll(rmax, d, axis=0),
                                           _NEG))
        d *= 2
    prev_rows = jnp.where(row >= 1, pltpu.roll(rmax, 1, axis=0), _NEG)
    return jnp.maximum(inc, prev_rows)


def _vb_dec_kernel(stream_hbm, *refs, GD, WIN, NB, K=5, rowmm=False):
    """K: densest target layout that holds every element (the GLOBAL
    max element length, host-derived from one terminator scan).  The
    expansion routes byte j of element e to slot K*e + j, so both the
    route round count (bits of K*E) and the target rows (K*E/128)
    shrink with K; WIN is byte-bounded (max actual window consumption,
    not the 5-bytes/element worst case), shrinking every byte-domain
    pass.  Together these were the PERF.md backlog's 'denser target
    layout' (vbyte trailed svb 468 vs 666M).

    rowmm: a host-hoisted (BD,BD) inclusive lower-triangular f32 mask
    rides as an extra input and turns the terminator prefix's row pass
    into one MXU matmul instead of log2(BD) roll rounds (exact: row
    sums <= BD*128 << 2^24).  ANS_TPU_VB_ROWMM selects it at staging."""
    if rowmm:
        vbmask_ref, out_ref, cur_scr, win_scr, sem = refs
    else:
        out_ref, cur_scr, win_scr, sem = refs
    b = pl.program_id(0)
    S, R = _S_DEC, _R_DEC
    E = GD * S                         # elements per window
    BD = 4 * WIN                       # byte-domain rows
    ERt = (K * E) // 128               # route target rows
    Rw = max(BD, ERt)                  # route domain rows

    @pl.when(b == 0)
    def _init():
        cur_scr[:] = jnp.zeros((1, 128), jnp.int32)

    cursor = cur_scr[:]
    row0 = _lsr(cursor[0, 0], 9)
    dma = pltpu.make_async_copy(
        stream_hbm.at[pl.ds(row0, WIN)], win_scr, sem)
    dma.start()
    dma.wait()
    win = win_scr[:]
    parts = [(_lsr(win, 8 * j)) & 0xFF for j in range(4)]
    byte = _expand_parts(parts, 4, WIN)               # (BD,128)
    # normalize: shift the byte array left by the intra-row offset so
    # position 0 is the cursor (power-of-two conditional shifts)
    base = jnp.broadcast_to(cursor[0:1, 0:1] - (row0 << 9), (BD, 128))
    for k in range(9):
        cond = ((base >> k) & 1) == 1
        byte = jnp.where(cond, _flatshift_fwd(byte, 1 << k, BD) & 0xFF,
                         byte)
    rowB = jax.lax.broadcasted_iota(jnp.int32, (BD, 128), 0)
    laneB = jax.lax.broadcasted_iota(jnp.int32, (BD, 128), 1)
    p = rowB * 128 + laneB
    term = 1 - (_lsr(byte, 7) & 1)
    e_excl, _ = _prefixc(term, BD, 1,                 # terms in [0,p)
                         rowmask=vbmask_ref[:] if rowmm else None)
    # start markers: p == 0, or the previous byte terminated
    termprev = _flatshift_back(term, 1, BD) == 1
    smark = jnp.where((p == 0) | termprev, p, _NEG)
    start = _prefixmax(smark, BD)                     # element start
    owned = e_excl < E
    delta = K * e_excl - start
    w = jnp.where(owned, (delta << 8) | byte, _NEG)
    if Rw > BD:
        w = jnp.concatenate(
            [w, jnp.full((Rw - BD, 128), _NEG, jnp.int32)], axis=0)
    RB = max(1, (K * E - 1).bit_length())
    w = _route_right(w, RB, Rw)
    present = ((w >= 0) & ((w >> 8) == 0)).astype(jnp.int32)
    slot = jnp.where(present > 0, w & 0xFF, 0)
    pj = _collapse(present[:ERt], K, E // 128)
    bj = _collapse(slot[:ERt], K, E // 128)
    val = jnp.zeros((E // 128, 128), jnp.int32)
    for j in range(K):
        val = val | jnp.where(pj[j] > 0, (bj[j] & 0x7F) << (7 * j), 0)
    out_ref[0] = pltpu.bitcast(val, jnp.uint32).reshape(GD, R, 128)
    # cursor advance needs only the TOTAL owned count, not a prefix:
    # one tree reduce instead of a second full _prefixc
    consumed = jnp.sum(owned.astype(jnp.int32))
    cur_scr[:] = cursor + consumed


@functools.partial(jax.jit,
                   static_argnames=("GD", "WIN", "NB", "SWrows", "K",
                                    "rowmm", "interpret"))
def _vb_dec_call(stream2, *extra, GD, WIN, NB, SWrows, K=5, rowmm=False,
                 interpret=False):
    in_specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    if rowmm:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    out = pl.pallas_call(
        functools.partial(_vb_dec_kernel, GD=GD, WIN=WIN, NB=NB, K=K,
                          rowmm=rowmm),
        grid=(NB,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, GD, _R_DEC, 128),
                               lambda bl: (bl, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, GD, _R_DEC, 128),
                                       jnp.uint32),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.VMEM((WIN, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(stream2, *extra)
    return out.reshape(NB * GD, _S_DEC)


def _scan_vbyte(data: np.ndarray, n: int, E: int,
                chunk: int = 1 << 22):
    """One bounded-memory pass over the payload: returns (K = max
    element length, max_con = max bytes consumed by any window of E
    elements).  Chunked so the transient index arrays stay ~chunk*8
    bytes regardless of stream size."""
    if n == 0:
        return 1, 0
    K = 1
    max_con = 0
    seen = 0            # elements completed so far
    last_term = -1      # absolute position of the last terminator
    win_start = 0       # byte offset where the current window started
    for c0 in range(0, len(data), chunk):
        if seen >= n:
            break
        piece = data[c0:c0 + chunk]
        t = np.flatnonzero((piece & 0x80) == 0)
        if len(t) == 0:
            continue
        t = t[: n - seen] + c0          # absolute terminator positions
        # max element length: gaps between consecutive terminators
        # (the first element of the chunk starts after last_term)
        gaps = np.diff(np.concatenate(([last_term], t)))
        K = max(K, int(gaps.max()))
        # window boundaries crossed inside this chunk: element index
        # seen + j finishes at t[j]; window w covers [w*E, (w+1)*E)
        j0 = (-seen) % E                # first in-chunk window END
        for j in range(j0 - 1, len(t), E):
            # element seen+j is the LAST of its window when
            # (seen + j + 1) % E == 0; j = j0-1 may be -1 (skip)
            if j < 0:
                continue
            end = int(t[j]) + 1
            max_con = max(max_con, end - win_start)
            win_start = end
        last_term = int(t[-1])
        seen += len(t)
    if seen < n:
        raise ValueError(f"vbyte stream holds {seen} elements, "
                         f"caller asked for {n}")
    if K > 5:
        raise ValueError(f"corrupt vbyte stream: {K}-byte element "
                         f"(u32 elements never exceed 5)")
    # the (possibly partial) final window
    max_con = max(max_con, last_term + 1 - win_start)
    return K, max_con


def vbyte_stage(data: np.ndarray, n: int, *, GD: int = 8,
                interpret: bool = False):
    """Stage the vbyte decode inputs; returns (args, kwargs) for
    _vb_dec_call.

    One host terminator scan sizes the kernel to the DATA instead of
    the format's worst case: K = max element length (route target
    density / round count) and WIN = max bytes any one window actually
    consumes (every byte-domain pass) — the 5-bytes/element sizing made
    both ~2-4x larger than typical streams need."""
    S = _S_DEC
    T = -(-n // S)
    NB = max(1, -(-T // GD))
    E = GD * S
    data = np.ascontiguousarray(data, dtype=np.uint8)
    K, max_con = _scan_vbyte(data, n, E)
    WIN = -(-(-(-(max_con + 512) // 512) + 2) // 8) * 8  # 8-row align
    nbytes = -(-(len(data) + WIN * 512 + 512) // 512) * 512
    buf = np.zeros(nbytes, dtype=np.uint8)
    buf[: len(data)] = data
    stream2 = jnp.asarray(buf.view("<i4").reshape(-1, 128))
    args = (stream2,)
    rowmm = os.environ.get("ANS_TPU_VB_ROWMM", "0") not in ("", "0")
    if rowmm:
        BD = 4 * WIN
        tri = np.tril(np.ones((BD, BD), dtype=np.float32))
        args += (jnp.asarray(tri),)
    return args, dict(GD=GD, WIN=WIN, NB=NB,
                      SWrows=stream2.shape[0], K=K, rowmm=rowmm,
                      interpret=interpret)


def vbyte_decode(data: np.ndarray, n: int, *, GD: int = 8,
                 interpret: bool = False) -> np.ndarray:
    """vbyte decode through the Pallas kernel.  data: payload u8.
    Returns (>=n,) u32 device array (caller trims)."""
    args, kw = vbyte_stage(data, n, GD=GD, interpret=interpret)
    return _vb_dec_call(*args, **kw)
