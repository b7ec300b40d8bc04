"""Frequency-grouped slot layout: the large-alphabet production path.

The pivot-search kernel's cost scales with sigma (it probes the
cumulative bases of every present symbol), so genuinely large alphabets
(sigma >> 2^13: ans_int on zipf-2^20 / word ids / uniform16) fell off
the Pallas path entirely.  This module removes the sigma scaling from
the STATE-UPDATE side altogether by changing the frame's slot layout
(the lane format owns its slot layout — compression depends only on the
frequencies, reference ans_int.hpp:52-64 builds value-cumulative tables
merely by convention):

  * Present symbols are ranked by (frequency desc, value asc) and slots
    are assigned in rank order; symbols sharing one frequency value f
    form a GROUP occupying one contiguous slot range of count*f slots,
    laid out symbol-major (rank j within the group owns slots
    [g_slot0 + j*f, g_slot0 + (j+1)*f)).
  * Because the frequencies sum to M, the number of DISTINCT frequency
    values obeys NG*(NG+1)/2 <= M, i.e. NG <= sqrt(2M) <= 2896 for the
    format's largest frame 2^22 — a hard bound independent of sigma.
  * Decode therefore needs only NG-sized tables to update the state:
    find the group by a bitwise binary search over the NG group slot
    boundaries, then ONE exact Granlund-Montgomery division by f gives
    the in-group symbol index j, the slot offset, and the dense rank —
    freq = f and offset fall out with no per-slot or per-symbol table.
  * Encode is symmetric in rank space: the group of a RANK is a search
    over the NG group rank boundaries, and base(rank) =
    g_slot0 + (rank - g_rank0) * f.  Encoders therefore feed the scan
    kernel ranks (a host remap for raw values, or an in-kernel packed
    rank table for device-mapped alphabets <= 2^16ish like ans_msb).

The only remaining sigma-sized per-step work is rank -> output value
(or rank -> high/nb for folded coders), a pure table read off the
sequential critical path, stored as bit-packed PLANES (16/8/4/2-bit
lanes of a u32 word) so a lookup costs ceil(sigma/(32/bits)/128)
shuffle rows shared by all S lanes of a step.

Layout choice is a pure function of the prelude frequencies
(use_grouped_layout), so the decoder derives the encoder's layout from
the wire bytes with no extra header field (docs/FORMAT.md fmt 2).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

# the pivot-search kernel stays the better engine up to this live-symbol
# count (its pivots scan ~sigma/128 rows; the grouped engine's value
# planes only win beyond it) — FORMAT CONSTANT: changing it changes
# which slot layout encoders emit (decoders re-derive it from nfreqs)
GROUPED_MIN_SIGMA = (1 << 13) + 1


def use_grouped_layout(nfreqs) -> bool:
    """Pure function of the prelude frequency vector (both coder sides
    must agree; see module docstring)."""
    nf = np.asarray(nfreqs)
    return int(np.count_nonzero(nf)) >= GROUPED_MIN_SIGMA


def _gm_magic(f: np.ndarray):
    """Granlund-Montgomery round-up division magics for u32 / f (exact
    for every u32 numerator; tables.build_enc_table carries the same
    construction and the encode kernel the same evaluation)."""
    f = f.astype(np.uint64)
    magic = np.zeros(len(f), dtype=np.uint32)
    big = f >= 2
    if big.any():
        d = f[big]
        l = np.frexp((d - np.uint64(1)).astype(np.float64))[1].astype(
            np.uint64)
        magic[big] = (((np.uint64(1) << (np.uint64(32) + l)) // d)
                      + np.uint64(1) - (np.uint64(1) << np.uint64(32))
                      ).astype(np.uint32)
    return magic


def _search_pivots(bounds: np.ndarray, pad_value: int):
    """Bitwise-binary-search pivot levels over a sorted boundary array
    (same probe schedule as tables.build_search_table: level k probes
    bounds[(m << (k+1)) + 2^k], deepest level first)."""
    nb = len(bounds)
    depth = (nb - 1).bit_length() if nb > 1 else 0
    P = 1 << depth
    pad = np.full(P, pad_value, dtype=np.int64)
    pad[:nb] = bounds
    pivots = []
    for k in range(depth):
        idxs = (np.arange(P >> (k + 1)) << (k + 1)) + (1 << k)
        pivots.append(pad[idxs].astype(np.int32))
    return tuple(pivots), depth


@dataclass(frozen=True)
class GroupLayout:
    """Host-side description of the frequency-grouped frame."""

    perm: np.ndarray        # u32 (sigma,) rank -> symbol id
    rank_of: np.ndarray     # u32 (len(nfreqs),) symbol id -> rank (0 if absent)
    g_f: np.ndarray         # u32 (NG,) frequency of each group
    g_rank0: np.ndarray     # u32 (NG,) first rank of each group
    g_slot0: np.ndarray     # u32 (NG,) first slot of each group
    g_magic: np.ndarray     # u32 (NG,) GM magic for division by g_f
    slot_pivots: tuple      # levels for slot -> group (pad M)
    slot_depth: int
    rank_pivots: tuple      # levels for rank -> group (pad sigma)
    rank_depth: int
    sigma: int
    frame_size: int
    log2m: int

    @property
    def num_groups(self) -> int:
        return len(self.g_f)

    def base_of_symbol(self) -> np.ndarray:
        """Per-symbol-id slot base under this layout (sized like nfreqs;
        0 for absent symbols) — feeds the XLA fallback encoder."""
        sigma = self.sigma
        ranks = np.arange(sigma, dtype=np.int64)
        g = np.searchsorted(self.g_rank0, ranks, side="right") - 1
        base_rank = (self.g_slot0[g].astype(np.int64)
                     + (ranks - self.g_rank0[g]) * self.g_f[g])
        out = np.zeros(len(self.rank_of), dtype=np.uint32)
        out[self.perm] = base_rank.astype(np.uint32)
        return out


def build_group_layout(nfreqs) -> GroupLayout:
    nf = np.asarray(nfreqs, dtype=np.int64)
    M = int(nf.sum())
    if M & (M - 1):
        raise ValueError(f"frame size {M} not a power of two")
    log2m = M.bit_length() - 1
    nz = np.flatnonzero(nf)
    if len(nz) == 0:
        raise ValueError("empty frequency vector")
    fz = nf[nz]
    # rank order: (freq desc, symbol asc) — np.lexsort is stable with the
    # last key primary, so (-freq) primary breaks ties by the ascending
    # original order of nz
    order = np.lexsort((nz, -fz))
    perm = nz[order].astype(np.uint32)
    f_sorted = fz[order]
    rank_of = np.zeros(len(nf), dtype=np.uint32)
    rank_of[perm] = np.arange(len(perm), dtype=np.uint32)
    # group boundaries = runs of equal frequency in rank order
    starts = np.flatnonzero(np.diff(f_sorted, prepend=f_sorted[0] + 1))
    g_f = f_sorted[starts]
    g_rank0 = starts.astype(np.int64)
    counts = np.diff(np.append(starts, len(perm)))
    g_slot0 = np.concatenate(([0], np.cumsum(counts * g_f)[:-1]))
    slot_pivots, slot_depth = _search_pivots(g_slot0, M)
    rank_pivots, rank_depth = _search_pivots(g_rank0, len(perm))
    return GroupLayout(
        perm=perm, rank_of=rank_of,
        g_f=g_f.astype(np.uint32), g_rank0=g_rank0.astype(np.uint32),
        g_slot0=g_slot0.astype(np.uint32), g_magic=_gm_magic(g_f),
        slot_pivots=slot_pivots, slot_depth=slot_depth,
        rank_pivots=rank_pivots, rank_depth=rank_depth,
        sigma=len(perm), frame_size=M, log2m=log2m)


# --------------------------------------------------------------------------
# bit-packed plane tables (rank-indexed per-symbol data)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class Plane:
    """One bit-packed table: entry i lives in word i >> log2per at bit
    (i & (per-1)) << log2bits, contributing (entry << shift) to the
    composed value (the kernel SUMS contributions — disjoint bitfields
    behave like OR, anchored tables carry real adds).

    idx_shift/padded: the entry index is (prank if padded else rank)
    >> idx_shift, where prank is the group-aligned padded rank
    (anchored representations index one anchor per 2^idx_shift ranks;
    see build_group_table)."""

    words: np.ndarray  # u32 (ceil(n/per),)
    bits: int          # 2 | 4 | 8 | 16
    shift: int         # contribution shift in the composed value
    rows: int          # ceil(len(words)/128)
    idx_shift: int = 0
    padded: bool = False


def _pack_plane(vals: np.ndarray, bits: int, shift: int,
                idx_shift: int = 0, padded: bool = False) -> Plane:
    per = 32 // bits
    v = np.asarray(vals, dtype=np.uint64) & ((1 << bits) - 1)
    pad = (-len(v)) % per
    if pad:
        v = np.concatenate([v, np.zeros(pad, np.uint64)])
    v = v.reshape(-1, per)
    sh = (np.arange(per, dtype=np.uint64) * bits)
    words = (v << sh).sum(axis=1).astype(np.uint32)
    return Plane(words=words, bits=bits, shift=shift,
                 rows=max(1, -(-len(words) // 128)),
                 idx_shift=idx_shift, padded=padded)


def _min_bits(maxval: int) -> int:
    for b in (2, 4, 8, 16):
        if maxval < (1 << b):
            return b
    return 16


def plane_rows(vals_max: int, count: int) -> int:
    """Total shuffle-row count of pack_planes(vals) for a table of
    `count` entries with maximum value `vals_max`, WITHOUT building the
    packed planes (the engine cost model runs per decode call)."""
    def rows(bits):
        return max(1, -(-count // (32 // bits) // 128))
    if vals_max == 0:
        return 0
    if vals_max < (1 << 16):
        return rows(_min_bits(vals_max))
    return rows(16) + rows(_min_bits(vals_max >> 16))


def pack_planes(vals: np.ndarray, idx_shift: int = 0,
                padded: bool = False) -> tuple:
    """Split a u32 table into packed planes (low 16 bits + a minimal
    high plane when needed).  An all-zero table packs to ()."""
    v = np.asarray(vals, dtype=np.uint32)
    mx = int(v.max()) if len(v) else 0
    if mx == 0:
        return ()
    if mx < (1 << 16):
        return (_pack_plane(v, _min_bits(mx), 0, idx_shift, padded),)
    hi = v >> np.uint32(16)
    return (_pack_plane(v & np.uint32(0xFFFF), 16, 0, idx_shift, padded),
            _pack_plane(hi, _min_bits(int(hi.max())), 16, idx_shift,
                        padded))


# --------------------------------------------------------------------------
# anchored (padded-rank) representation
# --------------------------------------------------------------------------
#
# A rank-indexed value table costs ceil(sigma*bits/32/128) scanned rows
# per plane lookup, and the scan is VPU-throughput bound — at
# sigma = 2^20 the 16+4-bit direct planes (~5000 rows) pin ans_int
# decode near 26 ns/int.  But the table's CONTENT is structured: within
# one frequency group, values ascend (the layout sorts ties by value),
# so value[rank] = anchor[prank >> s] + resid[prank] with a NARROW
# resid plane.  Two obstacles shape the construction:
#
#   * anchor blocks must not span group boundaries (values reset
#     between groups), so each group gets its own 2^s-aligned region of
#     a PADDED plane-index space;
#   * the resid width is global, but within-block value spans differ
#     wildly by group (a tiny high-frequency group scatters a handful
#     of symbols across the whole value range), so each group also gets
#     its own anchor DENSITY d_g <= s: its ranks advance by
#     2^(s - d_g) padded positions, giving one anchor per 2^d_g ranks
#     (d_g = 0 means every rank is its own anchor, resid 0).
#
# The kernel needs only prank = pr0_g + (j << (s - d_g)): the packed
# per-group word pr0 | (s - d_g) << PRANK_SHIFT_BITS rides the same
# NG-sized multi-lookup as f/rank0/magic.  Representation choice
# (direct vs anchored, the stride s, the resid width, and every d_g) is
# decided by exact scanned-row count from the actual table values.
# None of this is wire-visible: slots and ranks stay dense — the
# padding exists only in plane indices (a pure table representation).

_ANCHOR_STRIDES = (3, 4, 5)    # candidate log2 anchor strides s
_RESID_BITS = (2, 4, 8, 16)    # candidate resid plane widths
PRANK_SHIFT_BITS = 27          # advance exponent field in the packed
PRANK_MASK = (1 << 27) - 1     # per-group prank word


def _group_spans(layout: "GroupLayout", vals: np.ndarray, smax: int):
    """span[d][g] = max over d-level blocks (2^d consecutive ranks of
    group g, aligned to the group start) of last - first value.  Values
    ascend within a group, so block span = endpoint difference."""
    v = np.asarray(vals, dtype=np.int64)
    sigma = layout.sigma
    gr0 = layout.g_rank0.astype(np.int64)
    counts = np.diff(np.append(gr0, sigma))
    pos = np.arange(sigma, dtype=np.int64) - np.repeat(gr0, counts)
    NG = len(gr0)
    grp_of = np.repeat(np.arange(NG, dtype=np.int64), counts)
    spans = []
    for d in range(smax + 1):
        starts = np.flatnonzero((pos & ((1 << d) - 1)) == 0)
        ends = np.append(starts[1:], sigma) - 1
        sp = v[ends] - v[starts]
        out = np.zeros(NG, dtype=np.int64)
        np.maximum.at(out, grp_of[starts], sp)
        spans.append(out)
    return spans, counts


def plan_rank_planes(layout: "GroupLayout", vals: np.ndarray):
    """Pick the cheapest representation for a per-live-rank u32 table:
    direct packed planes over dense ranks, or per-group-density
    anchor + resid planes over a padded index space.  Returns
    (planes tuple, packed g_prank0 u32 (NG,) or None)."""
    direct = pack_planes(vals)
    rows_direct = sum(p.rows for p in direct)
    if rows_direct <= 4:
        return direct, None
    smax = max(_ANCHOR_STRIDES)
    spans, counts = _group_spans(layout, vals, smax)
    NG = layout.num_groups

    def plane_cost(nent, maxval, bits=None):
        if maxval == 0 or nent == 0:
            return 0
        if bits is None:
            if maxval < (1 << 16):
                return plane_cost(nent, maxval, _min_bits(maxval))
            return (plane_cost(nent, 0xFFFF, 16)
                    + plane_cost(nent, maxval >> 16,
                                 _min_bits(maxval >> 16)))
        words = -(-nent // (32 // bits))
        return max(1, -(-words // 128))

    vmax = int(np.asarray(vals).max(initial=0))
    best = None  # (rows, s, b, d_g)
    for s in _ANCHOR_STRIDES:
        stride = 1 << s
        for b in _RESID_BITS:
            # per group: densest anchor level whose span fits b bits
            # (d_g = 0: every rank its own anchor, no resid read — the
            # group lives past the resid plane's end, where the scan
            # lookup naturally contributes 0)
            d_g = np.zeros(NG, dtype=np.int64)
            for d in range(1, s + 1):
                d_g = np.where(spans[d] < (1 << b), d, d_g)
            adv = s - d_g
            L = ((counts << adv) + stride - 1) >> s << s
            plen_a = int(L[d_g > 0].sum())   # resid-covered prefix
            plen = int(L.sum())
            rows = plane_cost(plen >> s, vmax)
            rows += plane_cost(plen_a, (1 << b) - 1, b)
            if rows < (best[0] if best is not None else rows_direct):
                best = (rows, s, b, d_g)
    if best is None:
        return direct, None
    _, s, b, d_g = best
    stride = 1 << s
    adv = s - d_g
    L = ((counts << adv) + stride - 1) >> s << s
    # resid-bearing groups first: the resid plane covers only their
    # prefix of the padded space; exact-anchor (d_g = 0) groups follow
    order = np.argsort(d_g == 0, kind="stable")
    pr0 = np.zeros(NG, dtype=np.int64)
    pr0[order] = np.concatenate(([0], np.cumsum(L[order])[:-1]))
    plen = int(L.sum())
    plen_a = int(L[d_g > 0].sum())
    # scatter values to padded positions
    gr0 = layout.g_rank0.astype(np.int64)
    pos = (np.arange(layout.sigma, dtype=np.int64)
           - np.repeat(gr0, counts))
    ppos = np.repeat(pr0, counts) + (pos << np.repeat(adv, counts))
    tab = np.zeros(plen, dtype=np.int64)
    tab[ppos] = np.asarray(vals, dtype=np.int64)
    lv = np.zeros(plen, dtype=bool)
    lv[ppos] = True
    t2 = np.where(lv, tab, np.int64(1) << 62).reshape(-1, stride)
    blkmin = t2.min(axis=1)
    # empty blocks (pure padding) never looked up; zero their anchor
    blkmin = np.where(blkmin == np.int64(1) << 62, 0, blkmin)
    resid = np.where(lv, tab - np.repeat(blkmin, stride), 0)[:plen_a]
    assert int(resid.max(initial=0)) < (1 << b)
    planes = pack_planes(blkmin.astype(np.uint32), s, True)
    if plen_a:
        planes = planes + (_pack_plane(resid.astype(np.uint32), b, 0,
                                       0, True),)
    gpr = (pr0 | (adv << PRANK_SHIFT_BITS)).astype(np.uint32)
    return planes, gpr


@dataclass(frozen=True)
class GroupTable:
    """Device-upload bundle for the grouped decode kernel."""

    layout: GroupLayout
    val_planes: tuple      # () when value == rank (identity)
    high_planes: tuple     # fold/msb reconstruction (per rank)
    nb_plane: Plane | None  # exception byte counts (per dense rank)
    has_exc: bool
    max_nb: int
    g_prank0: np.ndarray | None = None  # u32 (NG,) padded rank starts

    @property
    def sigma(self):
        return self.layout.sigma

    @property
    def frame_size(self):
        return self.layout.frame_size

    @property
    def log2m(self):
        return self.layout.log2m

    @property
    def needs_prank(self) -> bool:
        return any(p.padded for p in self.val_planes + self.high_planes)


def build_group_table(layout: GroupLayout,
                      sym_high: np.ndarray | None = None,
                      sym_nb: np.ndarray | None = None) -> GroupTable:
    if sym_high is not None:
        high = np.asarray(sym_high, dtype=np.uint32)[layout.perm]
        nbr = np.asarray(sym_nb, dtype=np.uint32)[layout.perm]
        planes, gpr = plan_rank_planes(layout, high)
        return GroupTable(layout=layout, val_planes=(),
                          high_planes=planes,
                          nb_plane=_pack_plane(nbr, 2, 0), has_exc=True,
                          max_nb=int(nbr.max()), g_prank0=gpr)
    val = layout.perm
    identity = bool((val == np.arange(layout.sigma,
                                      dtype=np.uint32)).all())
    if identity:
        return GroupTable(layout=layout, val_planes=(),
                          high_planes=(), nb_plane=None, has_exc=False,
                          max_nb=0, g_prank0=None)
    planes, gpr = plan_rank_planes(layout, val)
    return GroupTable(layout=layout, val_planes=planes,
                      high_planes=(), nb_plane=None, has_exc=False,
                      max_nb=0, g_prank0=gpr)
