"""Encoder/decoder table construction for the lane-format rANS engine.

Host-side (NumPy, vectorized) — tables are built once per block from the
rescaled frequency vector and uploaded to the device.  Equivalent of the
reference's table builders (ans_int.hpp:52-64 encoder entries,
ans_int.hpp:100-163 decoder slot table, ans_fold.hpp:193-204 precomputed
un-fold entries), re-laid-out as structure-of-arrays so Pallas/VPU gathers
hit contiguous u32 vectors instead of packed structs.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..constants import A_KM_LOG2, A_MAX_FRAME_LOG2

# fmt A lower bound: state in [A_L, 256*A_L)
A_L = 1 << A_KM_LOG2


def max_renorm_rounds(log2m: int) -> int:
    """Renorm byte reads per decode step: after a step the state is
    >= L/M = 2^(23-log2m), so refilling 8 bits at a time reaches
    L = 2^23 in at most ceil((log2m)/8)+... concretely 2 reads suffice
    while M <= 2^16, 3 beyond.  Encoder placement and decoder reads
    MUST agree on this bound — every user calls this one helper."""
    return 2 if log2m <= 16 else 3


@dataclass(frozen=True)
class EncTable:
    """Per-symbol encode table (index = mapped symbol id).

    magic/mlog2 implement exact division by freq d via 32-bit
    multiply-high (Granlund-Montgomery round-up variant, Hacker's
    Delight 10-10): with l = ceil(log2 d) and
    magic = floor(2^(32+l)/d) + 1 - 2^32,
        t = mulhi32(x, magic); q = (t + ((x - t) >> 1)) >> (l - 1)
    is exact for every u32 x and d >= 2; d == 1 is selected around
    (q = x).  Replaces the per-symbol u32 divide in the Pallas encoder
    (no u64 vector ops on TPU; the reference divides at
    ans_int.hpp:80)."""

    freq: np.ndarray  # u32 (sigma,)
    base: np.ndarray  # u32 (sigma,) cumulative freq
    ub: np.ndarray  # u32 (sigma,) renorm threshold 256*(L/M)*freq
    magic: np.ndarray  # u32 (sigma,) GM round-up multiplier (0 for d=1)
    mlog2: np.ndarray  # u32 (sigma,) ceil(log2 freq)
    frame_size: int
    log2m: int


@dataclass(frozen=True)
class DecTable:
    """Per-slot decode table (index = state & (M-1)); SoA layout.

    Also carries the per-symbol inputs (nfreqs/sym_high/sym_nb) so the
    engine can derive the search-table representation (SearchTable) for
    the pivot-search Pallas kernel without re-threading every call site.

    layout: the frequency-grouped slot layout (ops/grouped.GroupLayout)
    when the frame uses it (use_grouped_layout of the prelude freqs);
    the per-slot arrays may then be None — the grouped Pallas kernel
    never needs them, and materialize_slots() fills them on demand for
    the XLA / direct engines (they can be ~100MB for M = 2^22).
    """

    freq: np.ndarray | None  # u32 (M,)
    offset: np.ndarray | None  # u32 (M,) slot - base[sym]
    sym: np.ndarray | None  # u32 (M,) owning symbol
    # fold/msb extensions (None for identity coders like ans_int):
    high: np.ndarray | None  # u32 (M,) reconstructed high part
    nb: np.ndarray | None  # u32 (M,) exception bytes to read
    frame_size: int
    log2m: int
    nfreqs: np.ndarray | None = None  # i64 (sigma,) scaled freqs
    sym_high: np.ndarray | None = None  # u32 (sigma,)
    sym_nb: np.ndarray | None = None  # u32 (sigma,)
    layout: object | None = None  # grouped.GroupLayout or None
    has_exc: bool = False


@dataclass(frozen=True)
class SearchTable:
    """Decode table for the pivot-search kernel: slot -> symbol by
    bitwise binary search over the cumulative-frequency bases of the
    *present* (freq > 0) symbols, so kernel cost scales with the live
    alphabet size instead of the frame size M.  The search tracks the
    bracketing base values, so freq and offset fall out for free; only
    fold/msb reconstruction data (high/nb) or a raw-value table needs a
    per-dense-symbol lookup.

    pivots[k] holds base[m * 2^(k+1) + 2^k] for level k of the search
    (k = depth-1 is probed first), padded with M past the live alphabet.
    """

    pivots: tuple  # level k -> (P >> (k+1),) i32 base values
    depth: int
    val: np.ndarray | None  # u32 (sigma,) raw value per dense id
    high: np.ndarray | None  # u32 (sigma,)
    nb: np.ndarray | None  # u32 (sigma,)
    sigma: int  # dense (present-symbol) count
    frame_size: int
    log2m: int


def build_search_table(nfreqs: np.ndarray,
                       high_of_sym: np.ndarray | None = None,
                       nb_of_sym: np.ndarray | None = None) -> SearchTable:
    nf = np.asarray(nfreqs, dtype=np.int64)
    M = int(nf.sum())
    log2m = _check_frame(M)
    nz = np.flatnonzero(nf)
    sigma = len(nz)
    depth = (sigma - 1).bit_length() if sigma > 1 else 0
    P = 1 << depth
    base_pad = np.full(P, M, dtype=np.int32)
    base_pad[:sigma] = np.concatenate(
        ([0], np.cumsum(nf[nz])[:-1])).astype(np.int32)
    pivots = []
    for k in range(depth):
        idxs = (np.arange(P >> (k + 1)) << (k + 1)) + (1 << k)
        pivots.append(base_pad[idxs])
    if high_of_sym is not None:
        high = np.asarray(high_of_sym, dtype=np.uint32)[nz]
        nb = np.asarray(nb_of_sym, dtype=np.uint32)[nz]
        val = None
    else:
        high = nb = None
        # identity when every symbol id 0..sigma-1 is present
        val = None if sigma == len(nf) else nz.astype(np.uint32)
    return SearchTable(pivots=tuple(pivots), depth=depth, val=val,
                       high=high, nb=nb, sigma=sigma, frame_size=M,
                       log2m=log2m)


def _check_frame(M: int) -> int:
    if M & (M - 1):
        raise ValueError(f"frame size {M} not a power of two")
    log2m = M.bit_length() - 1
    if log2m > A_MAX_FRAME_LOG2:
        raise ValueError(
            f"frame 2**{log2m} exceeds the lane format's limit "
            f"2**{A_MAX_FRAME_LOG2}; for giant raw alphabets use the "
            f"compat engine (models.get(name, 'compat')), a folded coder "
            f"(ANSmsb/ANSfold), or pass max_frame to the codec")
    return log2m


def build_enc_table(nfreqs: np.ndarray, layout=None) -> EncTable:
    """layout: a grouped.GroupLayout — base values then follow the
    frequency-grouped slot order instead of the value-cumulative one
    (freq/ub/magic are layout-independent)."""
    nf = np.asarray(nfreqs, dtype=np.uint64)
    M = int(nf.sum())
    log2m = _check_frame(M)
    if layout is not None:
        base = layout.base_of_symbol()
    else:
        base = np.concatenate(([0], np.cumsum(nf)[:-1])).astype(np.uint32)
    # 256 * (L/M) * freq; L/M = 2**(A_KM_LOG2 - log2m) is an exact integer
    k256 = np.uint64(1) << np.uint64(A_KM_LOG2 - log2m + 8)
    ub = (k256 * nf).astype(np.uint32)  # <= 2**31 * f / M <= 2**31, fits
    # Granlund-Montgomery magics, vectorized over the live symbols only
    # (the old per-symbol Python bigint loop walked the FULL sparse
    # alphabet — seconds of host stall per block for large-max_sym
    # AnsInt).  d <= M <= 2^22, so l <= 22 and (1 << (32+l)) fits u64
    # exactly; float64 floor-div would round, u64 integer div is exact.
    magic = np.zeros(len(nf), dtype=np.uint32)
    mlog2 = np.zeros(len(nf), dtype=np.uint32)
    live = np.flatnonzero(nf >= 2)
    if len(live):
        d = nf[live]
        l = np.frexp((d - np.uint64(1)).astype(np.float64))[1].astype(
            np.uint64)                    # bit_length of d-1 (exact:
        # frexp exponent of x is bit_length for exact-integer floats,
        # and d-1 < 2^22 is exactly representable
        mlog2[live] = l.astype(np.uint32)
        magic[live] = (((np.uint64(1) << (np.uint64(32) + l)) // d)
                       + np.uint64(1) - (np.uint64(1) << np.uint64(32))
                       ).astype(np.uint32)
    return EncTable(freq=nf.astype(np.uint32), base=base, ub=ub,
                    magic=magic, mlog2=mlog2, frame_size=M, log2m=log2m)


def build_dec_table(nfreqs: np.ndarray,
                    high_of_sym: np.ndarray | None = None,
                    nb_of_sym: np.ndarray | None = None,
                    layout=None, slots: bool = True) -> DecTable:
    """layout: grouped.GroupLayout — slots follow the frequency-grouped
    order.  slots=False skips the M-sized per-slot arrays (the grouped
    Pallas kernel never reads them; materialize_slots fills them when an
    XLA/direct engine needs the table)."""
    nf = np.asarray(nfreqs, dtype=np.int64)
    M = int(nf.sum())
    log2m = _check_frame(M)
    sym_high = sym_nb = None
    if high_of_sym is not None:
        sym_high = np.asarray(high_of_sym, dtype=np.uint32)
        sym_nb = np.asarray(nb_of_sym, dtype=np.uint32)
    dt = DecTable(freq=None, offset=None, sym=None, high=None, nb=None,
                  frame_size=M, log2m=log2m, nfreqs=nf,
                  sym_high=sym_high, sym_nb=sym_nb, layout=layout,
                  has_exc=high_of_sym is not None)
    return materialize_slots(dt) if slots else dt


def materialize_slots(dt: DecTable) -> DecTable:
    """Fill the M-sized per-slot arrays of a slim DecTable (no-op when
    already present).  With a grouped layout, slot order is rank-
    cumulative: symbol layout.perm[r] owns the r-th contiguous run."""
    if dt.freq is not None:
        return dt
    import dataclasses
    nf = dt.nfreqs
    if dt.layout is not None:
        order = dt.layout.perm.astype(np.int64)
    else:
        order = np.arange(len(nf), dtype=np.int64)
    f_run = nf[order]
    sym = np.repeat(order, f_run).astype(np.uint32)
    freq = np.repeat(f_run, f_run).astype(np.uint32)
    base_run = np.concatenate(([0], np.cumsum(f_run)[:-1]))
    offset = (np.arange(dt.frame_size, dtype=np.int64)
              - np.repeat(base_run, f_run)).astype(np.uint32)
    high = nb = None
    if dt.sym_high is not None:
        high = dt.sym_high[sym]
        nb = dt.sym_nb[sym]
    return dataclasses.replace(dt, freq=freq, offset=offset, sym=sym,
                               high=high, nb=nb)
