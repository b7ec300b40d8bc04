"""Decode-engine dispatch + device-resident prepared decoders.

Two call patterns:
  * decode(...)          - one-shot: stage inputs, run, return host array
  * PreparedDecoder(...) - stage tables + stream on device once, then
    every call runs only the kernel.  This is both the production
    serving pattern (compressed blocks live in HBM next to the consumer)
    and the honest device benchmark: on this machine host<->device moves
    ~45 MB/s through the axon relay, two orders of magnitude below real
    PCIe/DMA, so one-shot numbers are transfer-bound artifacts.

Engine choice: Pallas TPU kernel when the frame fits its table packing
(freq/offset u16, M <= PALLAS_MAX_FRAME) and S is a lane multiple;
XLA scan otherwise (CPU backend included).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lane_codec, tables

# largest frame the shuffle-based Pallas table lookup handles well
# (lookup cost ~ M/65536 cycles/symbol)
PALLAS_MAX_FRAME = 1 << 16


def interpret_env() -> bool:
    """ANS_TPU_INTERPRET=1 runs every Pallas path in interpreter mode
    on any backend — chip-free end-to-end fuzzing of the production
    dispatch (tools/fuzz_lane.py).  Never set it for performance
    work: interpreted kernels are orders of magnitude slower."""
    return bool(os.environ.get("ANS_TPU_INTERPRET"))


def _pallas_env_ok(S: int) -> bool:
    """Shared environment/shape gate for every Pallas lane path: not
    disabled, a real TPU backend (or forced interpreter mode), and S
    filling whole vector rows."""
    return (not os.environ.get("ANS_TPU_NO_PALLAS")
            and (jax.default_backend() == "tpu" or interpret_env())
            and S >= 128 and S % 128 == 0)


def _encode_env_ok(et: tables.EncTable, S: int) -> bool:
    if not _pallas_env_ok(S):
        return False
    # R = S/128 must be a power of two: the placement kernel maps rows
    # to (step, row) with `rowGR >> logR` / `rowGR & (R-1)`
    if (S // 128) & (S // 128 - 1):
        return False
    M = et.frame_size
    if M < 2 or M > (1 << 22):
        return False
    return int(et.freq.max()) < M


def encode_pallas_ok(et: tables.EncTable, S: int) -> bool:
    """Pallas encode scan applies when ub stays below 2^31 (max freq
    < M <= 2^22; M <= 2^16 packs freq<<16|base in one word, larger
    frames split the tables), the alphabet's shuffle-lookup stays
    bounded, and lanes fill whole vector rows.  Alphabets past the
    lookup cap use the grouped scan instead (encode_grouped_ok)."""
    if not _encode_env_ok(et, S):
        return False
    return len(et.freq) <= (1 << 13)  # sym->table lookup rows cap


def encode_grouped_ok(et: tables.EncTable, S: int, layout) -> bool:
    """Grouped encode scan: rank-space prefetch bounded by the group
    count (ops/grouped.py), any sigma."""
    return layout is not None and _encode_env_ok(et, S)


def _pallas_ok(dt: tables.DecTable, S: int) -> bool:
    if not _pallas_env_ok(S):
        return False
    fmax = (int(dt.freq.max()) if dt.freq is not None
            else int(np.asarray(dt.nfreqs).max()))
    if fmax >= 1 << 16:
        return False  # freq|offset word packing needs u16 fields
    return dt.frame_size <= PALLAS_MAX_FRAME


# largest live alphabet the pivot-search kernel handles well (the final
# search levels + per-symbol lookup cost ~ 6*sigma/128 shuffle rows)
SEARCH_MAX_SIGMA = 1 << 13


def _search_cost(dt: tables.DecTable):
    """Estimated per-step vector-op count of the pivot-search kernel
    (None when ineligible).  Mirrors pallas_decode._kernel_search."""
    if dt.nfreqs is None or dt.frame_size > (1 << 22):
        return None
    sigma = int((np.asarray(dt.nfreqs) > 0).sum())
    if sigma > SEARCH_MAX_SIGMA:
        return None
    depth = (sigma - 1).bit_length() if sigma > 1 else 0
    cost = 0
    for k in range(depth):
        rows = max(1, -(-(1 << (depth - 1 - k)) // 128))
        cost += 3 * rows + 4
    if dt.sym_high is not None or sigma != len(dt.nfreqs):
        cost += 3 * max(1, -(-sigma // 128))  # w2 (+w3) lookup
    return cost


def _grouped_cost(dt: tables.DecTable):
    """Estimated per-step vector-op count of the grouped kernel (None
    when the table has no grouped layout).  Mirrors
    pallas_decode._kernel_grouped: group search + three NG lookups +
    the bit-packed value/high plane scans."""
    lay = dt.layout
    if lay is None:
        return None
    from ..ops import grouped as _g
    NGr = max(1, -(-lay.num_groups // 128))
    cost = 9 * NGr + 10                        # f/r0/magic + divide
    for k in range(lay.slot_depth):
        rows = max(1, -(-(1 << (lay.slot_depth - 1 - k)) // 128))
        cost += 3 * rows + 4
    # plane rows computed arithmetically — building the sigma-sized
    # packed planes here would duplicate PreparedDecoder's work on
    # every decode call
    if dt.sym_high is not None:
        cost += 3 * _g.plane_rows(int(dt.sym_high.max()), lay.sigma)
        cost += 3 * max(1, -(-lay.sigma // 16 // 128))  # nb plane
    else:
        cost += 3 * _g.plane_rows(int(lay.perm.max(initial=0)),
                                  lay.sigma)
    return cost


def choose_decode_engine(dt: tables.DecTable, S: int) -> str:
    """'grouped' | 'search' | 'direct' | 'xla' (env
    ANS_TPU_DECODE_ENGINE forces, but only within eligibility — a
    forced Pallas engine on a table it cannot represent would stage
    garbage, so ineligible forces fall back with a warning).

    The search engine assumes value-cumulative slot order and the
    grouped engine the frequency-grouped order (the slot layout is a
    format property derived from the prelude, ops/grouped.py), so each
    is only eligible under its own layout; the direct and XLA engines
    read per-slot tables and work under either."""
    env = os.environ.get("ANS_TPU_DECODE_ENGINE")
    if env:
        eligible = (env == "xla"
                    or (env == "direct" and _pallas_ok(dt, S))
                    or (env == "search" and dt.layout is None
                        and _pallas_env_ok(S)
                        and _search_cost(dt) is not None)
                    or (env == "grouped" and dt.layout is not None
                        and _pallas_env_ok(S)))
        if eligible:
            return env
        import warnings
        warnings.warn(
            f"ANS_TPU_DECODE_ENGINE={env!r} is not eligible for this "
            f"table (sigma/frame/backend/layout out of range); falling "
            f"back to automatic engine choice", stacklevel=2)
    if not _pallas_env_ok(S):
        return "xla"
    direct = (6 * -(-dt.frame_size // 128) if _pallas_ok(dt, S)
              else None)
    alt = (("grouped", _grouped_cost(dt)) if dt.layout is not None
           else ("search", _search_cost(dt)))
    if direct is None and alt[1] is None:
        return "xla"
    if alt[1] is None or (direct is not None and direct <= alt[1]):
        return "direct"
    return alt[0]


class PreparedDecoder:
    """All decode inputs staged on device; call to run the kernel.

    engine/interpret are harness knobs (tools/fuzz_lane.py, kernel
    tests): an explicit engine bypasses choose_decode_engine — the
    caller owns eligibility — and interpret=True runs the Pallas
    kernels in interpreter mode on any backend.  Production callers
    pass neither."""

    def __init__(self, payload: np.ndarray, states: np.ndarray,
                 dt: tables.DecTable, n: int, *, S: int, T: int,
                 has_exc: bool, t_sec: int, sec_len, TC: int = 128,
                 engine: str | None = None, interpret: bool = False):
        self.n, self.S, self.T = n, S, T
        interpret = interpret or interpret_env()
        if engine is not None:
            if engine != "xla" and (S < 128 or S % 128):
                raise ValueError(
                    f"forced engine {engine!r} needs S to fill whole "
                    f"vector rows (multiple of 128, got S={S})")
            self.engine = engine
        else:
            self.engine = (choose_decode_engine(dt, S)
                           if t_sec is not None else "xla")
        if self.engine == "grouped":
            from ..ops import grouped, pallas_decode
            gt = grouped.build_group_table(dt.layout, dt.sym_high,
                                           dt.sym_nb)
            (self._args, self._kw) = pallas_decode.stage_grouped(
                payload, states, gt, n, S=S, T=T, t_sec=t_sec,
                sec_len=sec_len, TC=TC, interpret=interpret)
            self._fn = pallas_decode._call_grouped
        elif self.engine == "search":
            from ..ops import pallas_decode
            st = tables.build_search_table(dt.nfreqs, dt.sym_high,
                                           dt.sym_nb)
            (self._args, self._kw) = pallas_decode.stage_search(
                payload, states, st, n, S=S, T=T, t_sec=t_sec,
                sec_len=sec_len, TC=TC, interpret=interpret)
            self._fn = pallas_decode._call_search
        elif self.engine == "direct":
            from ..ops import pallas_decode
            dt = tables.materialize_slots(dt)
            (self._args, self._kw) = pallas_decode.stage(
                payload, states, dt, n, S=S, T=T, has_exc=has_exc,
                t_sec=t_sec, sec_len=sec_len, TC=TC,
                interpret=interpret)
            self._fn = pallas_decode._call
        else:
            dt = tables.materialize_slots(dt)
            stream = np.concatenate([payload, np.zeros(8, np.uint8)])
            dummy = np.zeros(1, np.uint32)
            self._args = (
                jnp.asarray(stream), jnp.asarray(states),
                jnp.asarray(dt.freq), jnp.asarray(dt.offset),
                jnp.asarray(dt.sym),
                jnp.asarray(dt.high if has_exc else dummy),
                jnp.asarray(dt.nb if has_exc else dummy),
                jnp.int32(n))
            self._kw = dict(S=S, T=T, log2m=dt.log2m, has_exc=has_exc)
            self._fn = lane_codec.decode_lanes

    def __call__(self):
        """Run the kernel; returns the device array (>=T, S)."""
        return self._fn(*self._args, **self._kw)

    def to_host(self, out) -> np.ndarray:
        return np.asarray(out).reshape(-1)[: self.n].astype(np.uint32)


def decode(payload: np.ndarray, states: np.ndarray, dt: tables.DecTable,
           n: int, *, S: int, T: int, has_exc: bool,
           t_sec: int | None = None, sec_len=None) -> np.ndarray:
    """One-shot: stage, run, and return the trimmed host u32 array."""
    prep = PreparedDecoder(payload, states, dt, n, S=S, T=T,
                           has_exc=has_exc, t_sec=t_sec, sec_len=sec_len)
    return prep.to_host(prep())


class PreparedEncoder:
    """Device-resident encode: inputs staged (T,S), tables built, and
    the section plan fixed by one priming scan; every call then runs
    only the scan + placement kernels (the serving pattern, and the
    honest device encode benchmark — the one-shot path pays the axon
    relay's fixed per-dispatch sync cost on this machine).

    Requires the Pallas encode path (encode_pallas_ok); raises
    otherwise.
    """

    def __init__(self, mapped_ts, nb_ts, excb_ts, n: int,
                 et: tables.EncTable, *, S: int, T: int, G: int = None,
                 layout=None, vr_planes=None):
        """layout: the frequency-grouped slot layout — mapped_ts must
        then carry RANKS (host-remapped), or raw mapped symbols with
        vr_planes = grouped.pack_planes(layout.rank_of) for the
        in-kernel remap (device-mapped alphabets).  G=None: both the
        scan and placement derive their own VMEM-capped batch factors;
        an explicit G overrides both."""
        from ..ops import pallas_encode, pallas_place
        from . import framing
        itp = self._interpret = interpret_env()
        if layout is not None:
            if not encode_grouped_ok(et, S, layout):
                raise ValueError("grouped PreparedEncoder needs the "
                                 "Pallas envelope (TPU backend, "
                                 "M <= 2^22, lane multiple of 128)")
            self._do_scan = lambda: pallas_encode.encode_scan_grouped(
                self.mapped_ts, self._n32, layout, S=S, T=T, G=G,
                vr_planes=vr_planes, interpret=itp)
        elif encode_pallas_ok(et, S):
            self._do_scan = lambda: pallas_encode.encode_scan(
                self.mapped_ts, self.nb_ts, self._n32, et, S=S, T=T,
                G=G, interpret=itp)
        else:
            raise ValueError("PreparedEncoder needs the Pallas encode "
                             "path (TPU backend, M <= 2^22, lane "
                             "multiple of 128)")
        self._pe, self._pp = pallas_encode, pallas_place
        self.n, self.S, self.T, self.G, self.et = n, S, T, G, et
        self.mapped_ts, self.nb_ts, self.excb_ts = mapped_ts, nb_ts, excb_ts
        self._n32 = jnp.int32(n)
        packed, _, _ = self._do_scan()
        round_base, total = lane_codec.encode_totals(
            packed[:T], nb_ts, jnp.int32(n), S=S, T=T)
        self.total = int(total)
        self.t_sec, self.sec_len = framing.choose_sections(
            np.asarray(round_base)[::6], self.total, T)
        self.NR = tables.max_renorm_rounds(et.log2m)
        self.NE = int(jnp.max(nb_ts))

    def __call__(self):
        """Returns (stream sections (NSEC,SWr,128) i32, states) device."""
        packed, states, _ = self._do_scan()
        secs = self._pp.place(packed[: self.T], self.nb_ts, self.excb_ts,
                              self._n32, S=self.S, T=self.T,
                              t_sec=self.t_sec, sec_len=self.sec_len,
                              NR=self.NR, NE=self.NE, G=self.G,
                              interpret=self._interpret)
        return secs, states

    def to_bytes(self, secs, states) -> bytes:
        from . import framing
        stream = self._pp.sections_to_stream(np.asarray(secs),
                                             self.sec_len)
        return framing.pack(np.asarray(states).view(np.uint32), stream,
                            self.t_sec, self.sec_len)
