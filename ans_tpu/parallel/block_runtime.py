"""Block-data-parallel codec over a device mesh.

TPU-native scaling design (SURVEY.md section 2.6; no reference analogue —
the reference is single-threaded):

  * the input is split into D contiguous sections, one per mesh device;
  * one *shared* semi-static model is built from the global histogram
    (per-shard `jnp.bincount` + `lax.psum` over the mesh — the ICI
    collective replacing a serial pass);
  * the rescaled frequency table is broadcast to every device (replicated
    sharding — XLA moves it over ICI once);
  * every device runs the S-lane stream coder on its section (so the pod
    runs D*S independent ANS states);
  * compressed sections are gathered back in device order, giving
    deterministic, original-order reassembly.

Two per-device engines:

  * "pallas" — the production kernels (ops.pallas_encode/_place/_decode)
    called inside shard_map, one SPMD program per stage.  All static
    kernel parameters (section count, buffer rows, TC) are forced
    uniform across the mesh: t_sec is the minimum of the per-device
    section choices and the stream buffers are sized to the mesh-wide
    maximum, so every device runs the same compiled grid.
  * "xla" — the portable lax.scan engine (lane_codec), used off-TPU.

`engine="auto"` picks pallas on a real TPU backend, xla elsewhere;
`interpret=True` runs the pallas kernels in interpreter mode so the
multi-chip fast path is testable on the virtual CPU mesh.

Methods: ANS / ANSmsb / ANSfold-f / ANSrfold-f / ANSsint-H / ANSsmsb-H
(the rfold value remap is a host pass over the global counts, exactly
one extra psum'd histogram; reference: ans_reorder_fold.hpp:69-385).

Wire format ("ATFB" container v2): see docs/FORMAT.md section 3.
"""

from __future__ import annotations

import functools
import os
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import (MSB_MAX_SIGMA, fold_max_sigma, fold_threshold)
from ..ops import lane_codec, mappings_jax as mj, tables
from ..reference_model import mappings as map_np
from ..reference_model.model import (adjust_freqs, load_prelude,
                                     serialize_prelude)
from . import _shard_map
from ..models import config, framing

MAGIC = 0x41544642  # "BFTA" little-endian -> "ATFB"

KINDS = {"int": 0, "msb": 1, "fold": 2, "rfold": 3}
_KIND_NAMES = {v: k for k, v in KINDS.items()}


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def describe_container(blob: bytes):
    """(method, n, D) from an ATFB header — the inverse of
    _parse_method over the stored kind/fidelity/h_approx fields, so a
    caller (the file CLI) can build the matching BlockCodec without
    out-of-band knowledge."""
    magic, _ver, kind_id, fid, h_app, n, D = struct.unpack_from(
        "<IBBBBII", blob, 0)
    if magic != MAGIC:
        raise ValueError("not an ATFB container")
    kind = _KIND_NAMES[kind_id]
    if kind == "int":
        method = "ANS" if h_app == 1 else f"ANSsint-{h_app}"
    elif kind == "msb":
        method = "ANSmsb" if h_app == 1 else f"ANSsmsb-{h_app}"
    else:
        method = f"ANS{kind}-{fid}"
    return method, int(n), int(D)


def _parse_method(method: str):
    """-> (kind, fidelity, h_approx)."""
    if method == "ANS":
        return "int", 0, 1
    if method == "ANSmsb":
        return "msb", 0, 1
    for prefix, kind in (("ANSfold-", "fold"), ("ANSrfold-", "rfold"),
                         ("ANSsint-", "int"), ("ANSsmsb-", "msb")):
        if method.startswith(prefix):
            v = int(method[len(prefix):])
            if kind in ("fold", "rfold"):
                return kind, v, 1
            return kind, 0, v
    raise ValueError(f"blocked runtime supports ANS/ANSmsb/ANSfold-f/"
                     f"ANSrfold-f/ANSsint-H/ANSsmsb-H, not {method!r}")


class BlockCodec:
    """Shared-model, block-parallel encode/decode over a mesh."""

    def __init__(self, method: str = "ANSfold-2", mesh: Mesh | None = None,
                 lanes: int | None = None, h_approx: int | None = None,
                 engine: str = "auto", interpret: bool | None = None):
        self.kind, self.fidelity, h_m = _parse_method(method)
        self.h_approx = h_approx if h_approx is not None else h_m
        self.method = method
        self.mesh = mesh or make_mesh()
        self.lanes = config.validate_lanes(lanes)
        self.axis = self.mesh.axis_names[0]
        env = os.environ.get("ANS_TPU_BLOCK_ENGINE")
        if env and engine == "auto":
            engine = env
        if engine == "auto":
            engine = ("pallas" if jax.default_backend() == "tpu"
                      and not os.environ.get("ANS_TPU_NO_PALLAS")
                      else "xla")
        self.engine = engine
        self.interpret = (jax.default_backend() != "tpu"
                          if interpret is None else interpret)
        self._programs = {}  # (stage, *static_params) -> jitted program

    def _cached(self, key, build):
        if key not in self._programs:
            self._programs[key] = build()
        return self._programs[key]

    # -- shared-model front end (device psum histogram) --------------------

    @functools.cached_property
    def _sigma_cap(self):
        if self.kind == "msb":
            return MSB_MAX_SIGMA
        if self.kind in ("fold", "rfold"):
            return fold_max_sigma(self.fidelity)
        return None

    def _padding_symbol(self) -> int:
        """Mapped id the zero padding contributes to the histogram
        (vals are padded to D*B with zeros before the device pass)."""
        if self.kind == "msb":
            return int(map_np.msb_map(np.zeros(1, np.uint32))[0])
        if self.kind in ("fold", "rfold"):
            return int(map_np.fold_map(np.zeros(1, np.uint32),
                                       self.fidelity)[0])
        return 0

    def _map_hist_program(self, sigma_cap: int):
        """(D, B) u32 -> mapped/k/b sharded + replicated global histogram."""
        kind = "fold" if self.kind == "rfold" else self.kind
        fid, axis = self.fidelity, self.axis

        def body(vals):
            v = vals[0]
            if kind == "msb":
                mapped = mj.msb_map(v)
                k = mj.msb_exception_bytes(mapped)
            elif kind == "fold":
                mapped = mj.fold_map(v, fid)
                k = mj.fold_exception_count(v, fid)
            else:
                mapped, k = v, jnp.zeros_like(v)
            b = mj.low_bytes(v)
            hist = jax.lax.psum(jnp.bincount(mapped, length=sigma_cap),
                                axis)
            return mapped[None], k[None], b[None], hist

        return self._cached(("map_hist", sigma_cap), lambda: jax.jit(
            _shard_map.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(self.axis),),
                out_specs=(P(self.axis), P(self.axis), P(self.axis), P()))))

    # -- XLA (portable) per-device bodies ----------------------------------

    def _encode_program(self, S, T, log2m):
        axis = self.axis

        def body(mapped, k, b, n_sec, freq, base, ub):
            stream, total, states, step_base = lane_codec.encode_lanes_impl(
                mapped[0], k[0], b[0], n_sec[0], freq, base, ub,
                S=S, T=T, log2m=log2m)
            return stream[None], total[None], states[None], step_base[None]

        return self._cached(("enc", S, T, log2m), lambda: jax.jit(
            _shard_map.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis), P(axis),
                          P(), P(), P()),
                out_specs=(P(axis), P(axis), P(axis), P(axis)))))

    def _decode_program(self, S, T, log2m, has_exc):
        axis = self.axis

        def body(stream, states, n_sec, dfreq, doff, dsym, dhigh, dnb):
            out = lane_codec.decode_lanes_impl(
                stream[0], states[0], dfreq, doff, dsym,
                dhigh, dnb, n_sec[0], S=S, T=T, log2m=log2m,
                has_exc=has_exc)
            return out[None]

        return self._cached(("dec", S, T, log2m, has_exc), lambda: jax.jit(
            _shard_map.shard_map(
                body, mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis),
                          P(), P(), P(), P(), P()),
                out_specs=P(axis))))

    # -- Pallas per-device bodies (production kernels inside shard_map) ----

    def _scan_program(self, *, B, S, T, TCe, NT, G, Msr, log2m, big_m,
                      n_extra=0, grouped=False, gdepth=0, gprows=(),
                      vrspec=()):
        """map outputs -> packed scan words + totals, all device-resident.
        Returns per-device (packed (T,S) i32, nb (T,S) i32, excw (T,S)
        i32, states (S,) u32-bits, round_base (6T,), total ()).
        grouped/gdepth/gprows/vrspec: the rank-space prefetch of the
        frequency-grouped layout (extra = pivot levels [+ rank planes],
        replicated)."""
        from ..ops import pallas_encode
        axis, interp = self.axis, self.interpret
        pad, T_pad, R = T * S - B, NT * TCe, S // 128

        def body(mapped, k, b, n_sec, t1, t2, tb, *extra):
            n = n_sec[0]
            m_ts = jnp.pad(mapped[0].astype(jnp.int32),
                           (0, pad)).reshape(T, S)
            wa = jnp.pad(m_ts, ((0, T_pad - T), (0, 0))).reshape(
                NT, TCe, R, 128)
            out, states = pallas_encode._call(
                wa, n, t1, t2, tb, *extra, S=S, R=R, TC=TCe, NT=NT, G=G,
                Msr=Msr, log2m=log2m, big_m=big_m, grouped=grouped,
                gdepth=gdepth, gprows=gprows, vrspec=vrspec,
                interpret=interp)
            packed = out[:T]
            nb_ts = jnp.pad(k[0].astype(jnp.int32), (0, pad)).reshape(T, S)
            bb = b[0].astype(jnp.int32)
            excw = jnp.pad(bb[:, 0] | (bb[:, 1] << 8) | (bb[:, 2] << 16),
                           (0, pad)).reshape(T, S)
            round_base, total = lane_codec.encode_totals_impl(
                packed, nb_ts, n, S=S, T=T)
            return (packed[None], nb_ts[None], excw[None], states[None],
                    round_base[None], total[None])

        key = ("pscan", B, S, T, TCe, NT, G, Msr, log2m, big_m,
               grouped, gdepth, gprows, vrspec, interp)
        return self._cached(key, lambda: jax.jit(_shard_map.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis), P(), P(), P())
            + (P(),) * n_extra,
            out_specs=(P(axis),) * 6)))

    def _place_program(self, *, S, T, t_sec, NSEC, SWr, WIN, G, NR, NE):
        from ..ops import pallas_place
        axis, interp = self.axis, self.interpret
        R = S // 128
        T_stage = NSEC * t_sec
        NTB = T_stage // G

        def stage4(x):
            return jnp.pad(x, ((0, T_stage - T), (0, 0))).reshape(
                NTB, G, R, 128)

        def body(packed, nb, excw, n_sec):
            out = pallas_place._call(
                stage4(packed[0]), stage4(nb[0]), stage4(excw[0]),
                n_sec[0], S=S, R=R, G=G, T_SEC=t_sec, NSEC=NSEC,
                NTB=NTB, SWr=SWr, WIN=WIN, NR=NR, NE=NE,
                interpret=interp)
            return out[None]

        key = ("pplace", S, T, t_sec, NSEC, SWr, WIN, G, NR, NE, interp)
        return self._cached(key, lambda: jax.jit(_shard_map.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis)),
            out_specs=P(axis))))

    def _pallas_decode_program(self, fn, kw, n_tables):
        axis = self.axis
        kw = dict(kw)

        def body(stream3d, states2d, n_sec, *tabs):
            out = fn(stream3d[0], states2d[0], n_sec[0], *tabs, **kw)
            return out[None]

        key = ("pdec", fn.__name__, tuple(sorted(kw.items())), n_tables)
        return self._cached(key, lambda: jax.jit(_shard_map.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis)) + (P(),) * n_tables,
            out_specs=P(axis))))

    # -- host orchestration ------------------------------------------------

    def _reorder_remap(self, values: np.ndarray):
        """rfold host pass (shared craft_reorder; see
        reference_model/mappings.py).  Returns (remapped values,
        header bytes)."""
        from ..reference_model.mappings import craft_reorder
        return craft_reorder(values, self.fidelity)

    def encode(self, values, hist_override=None, premapped=None,
               reorder_header=None) -> bytes:
        """hist_override: a precomputed GLOBAL symbol histogram (the
        multi-host runtime passes the cross-process allreduce so every
        shard derives the same model; parallel/multihost.py).
        premapped: the (mapped, k, b) device arrays from a prior
        _map_hist_program run over the same values at the same
        sigma_cap, so multi-host encode doesn't pay the map pass twice.
        reorder_header: for rfold, the wire header bytes of an ALREADY
        APPLIED global reorder (multi-host derives the permutation from
        the allreduced raw histogram and remaps each shard before
        calling encode; the local remap here would disagree between
        shards)."""
        values = np.ascontiguousarray(values, dtype=np.uint32)
        n = len(values)
        if n == 0:
            raise ValueError("cannot encode an empty sequence")
        header_extra = b""
        if self.kind == "rfold":
            if reorder_header is not None:
                header_extra = reorder_header
            else:
                values, header_extra = self._reorder_remap(values)
        D = self.mesh.devices.size
        B = -(-n // D)
        vals = np.zeros(D * B, dtype=np.uint32)
        vals[:n] = values
        vals = vals.reshape(D, B)
        n_sec = np.clip(n - B * np.arange(D), 0, B).astype(np.int32)

        sigma_cap = self._sigma_cap or (int(values.max()) + 1)
        if hist_override is not None:
            sigma_cap = max(sigma_cap, len(hist_override))
        if premapped is not None:
            mapped, k, b = premapped
            hist = None
        else:
            mapped, k, b, hist = self._map_hist_program(sigma_cap)(vals)
        freqs = (np.asarray(hist) if hist_override is None
                 else np.asarray(hist_override)).astype(np.uint64)
        if hist_override is None and D * B > n:
            # the device pass histograms the zero padding too; remove
            # it so the model reflects the data (multihost subtracts
            # its own shard padding before the allreduce)
            freqs = freqs.copy()
            freqs[self._padding_symbol()] -= D * B - n
        max_sym = int(np.flatnonzero(freqs)[-1])
        from ..models.ans import lane_frame_cap
        nfreqs = adjust_freqs(freqs, max_sym, self.kind != "int",
                              self.h_approx, lane_frame_cap(None))
        prelude = serialize_prelude(nfreqs, int(nfreqs.sum()))
        # identity kind over a huge live alphabet: tail-escape recoding
        # (ops/escape.py) — the frame folds, the prelude stays true,
        # decode re-derives the same plan from the prelude
        plan = None
        if self.kind == "int":
            from ..ops import escape as escape_mod
            plan = escape_mod.plan_from_freqs(nfreqs)
        if plan is not None:
            m_np, k_np, b_np = plan.map_values(vals)
            mapped = jnp.asarray(m_np)
            k = jnp.asarray(k_np)
            b = jnp.asarray(b_np)
            frame_freqs = plan.frame_freqs
        else:
            frame_freqs = nfreqs
        from ..ops import grouped as grouped_mod
        layout = (grouped_mod.build_group_layout(frame_freqs)
                  if grouped_mod.use_grouped_layout(frame_freqs)
                  else None)
        et = tables.build_enc_table(frame_freqs, layout)

        S = self.lanes or config.default_lane_count(B)
        T = lane_codec.lane_steps(B, S)

        out = bytearray()
        out += struct.pack("<IBBBBII", MAGIC, 2, KINDS[self.kind],
                           self.fidelity, self.h_approx, n, D)
        out += header_extra
        out += struct.pack("<I", len(prelude)) + prelude

        if (self.engine == "pallas"
                and self._encode_pallas_ok(et, S, layout)):
            if layout is not None and self.kind == "int" and plan is None:
                # raw alphabet: one host rank remap replaces the scan's
                # sigma-scaling table lookups (the values are host-side
                # here; device-mapped kinds use in-kernel rank planes)
                mapped_g = jnp.asarray(layout.rank_of[vals])
                vr = None
            elif layout is not None:
                mapped_g = mapped
                vr = grouped_mod.pack_planes(layout.rank_of)
            else:
                mapped_g, vr = mapped, None
            secs_np, states, t_sec, sec_lens = self._encode_pallas(
                mapped_g, k, b, n_sec, et, S=S, T=T, layout=layout,
                vr_planes=vr)
            from ..ops import pallas_place
            for d in range(D):
                stream = pallas_place.sections_to_stream(
                    secs_np[d], sec_lens[d])
                sec = framing.pack(states[d], stream, t_sec, sec_lens[d])
                out += struct.pack("<I", len(sec)) + sec
            return bytes(out)

        # portable XLA engine
        pad = T * S - B
        mapped_ts = jnp.pad(mapped, ((0, 0), (0, pad))).reshape(D, T, S)
        k_ts = jnp.pad(k, ((0, 0), (0, pad))).reshape(D, T, S)
        b_ts = jnp.pad(b, ((0, 0), (0, pad), (0, 0))).reshape(D, T, S, 3)
        stream, totals, states, step_base = self._encode_program(
            S, T, et.log2m)(
            mapped_ts, k_ts, b_ts, jnp.asarray(n_sec),
            jnp.asarray(et.freq), jnp.asarray(et.base), jnp.asarray(et.ub))
        totals = np.asarray(totals)
        states = np.asarray(states)
        step_base = np.asarray(step_base)
        for d in range(D):
            t_sec, sec_len = framing.choose_sections(
                step_base[d], int(totals[d]), T)
            sec = framing.pack(states[d],
                               np.asarray(stream[d, : int(totals[d])]),
                               t_sec, sec_len)
            out += struct.pack("<I", len(sec)) + sec
        return bytes(out)

    def _encode_pallas_ok(self, et, S: int, layout=None) -> bool:
        M = et.frame_size
        # S/128 power-of-two: placement kernel row->(step,row) math
        return (S >= 128 and S % 128 == 0
                and (S // 128) & (S // 128 - 1) == 0
                and 2 <= M <= (1 << 22)
                # grouped layout: rank-space prefetch, no sigma cap
                and (layout is not None or len(et.freq) <= (1 << 13))
                and int(et.freq.max()) < M)

    def _encode_pallas(self, mapped, k, b, n_sec, et, *, S, T,
                       layout=None, vr_planes=None):
        """Scan + totals + placement through the production kernels, one
        SPMD program per stage; returns (sections (D,NSEC,SWr,128) i32
        host, states (D,S) u32 host, t_sec, per-device sec_len).

        layout: grouped slot layout — mapped then carries RANKS (or raw
        mapped symbols when vr_planes gives the in-kernel value->rank
        planes); the scan tables shrink to the NG-sized group arrays."""
        from ..ops import pallas_encode
        D = self.mesh.devices.size
        R = S // 128
        TCe = pallas_encode._cap_tc(128, S // 128)
        NT = -(-T // TCe)
        big_m = et.log2m > 16 and layout is None
        extra = ()
        if layout is not None:
            NGr = max(1, -(-layout.num_groups // 128))
            Msr = NGr
            vr_planes = vr_planes or ()
            vrspec = tuple((p.bits, p.rows, p.shift) for p in vr_planes)
            eff_rows = (3 * NGr + sum(min(r, 16) for _, r, _ in vrspec)
                        + 16)
            G = pallas_encode.choose_g(eff_rows * 128, S, et.log2m, TCe)
            gprows = []
            for p in layout.rank_pivots:
                r = max(1, -(-len(p) // 128))
                gprows.append(r)
                extra += (jnp.asarray(pallas_encode._pad_rows(
                    np.ascontiguousarray(p).view(np.uint32), r)),)
            extra += tuple(
                jnp.asarray(pallas_encode._pad_rows(
                    p.words.astype(np.uint32), p.rows))
                for p in vr_planes)
            t1 = jnp.asarray(pallas_encode._pad_rows(
                layout.g_f.astype(np.uint32), NGr))
            t2 = jnp.asarray(pallas_encode._pad_rows(
                layout.g_magic.astype(np.uint32), NGr))
            tb = jnp.asarray(pallas_encode._pad_rows(
                layout.g_slot0.astype(np.uint32), NGr))
            gkw = dict(grouped=True, gdepth=layout.rank_depth,
                       gprows=tuple(gprows), vrspec=vrspec)
        else:
            sigma = len(et.freq)
            Msr = -(-sigma // 128)
            G = pallas_encode.choose_g(sigma, S, et.log2m, TCe)
            if big_m:
                t1 = jnp.asarray(pallas_encode._pad_rows(
                    et.freq.astype(np.uint32), Msr))
                tb = jnp.asarray(pallas_encode._pad_rows(
                    et.base.astype(np.uint32), Msr))
            else:
                t1 = jnp.asarray(pallas_encode._pad_rows(
                    (et.freq.astype(np.uint32) << 16)
                    | et.base.astype(np.uint32), Msr))
                tb = jnp.zeros((1, 128), jnp.int32)
            t2 = jnp.asarray(pallas_encode._pad_rows(
                et.magic.astype(np.uint32), Msr))
            gkw = dict(grouped=False, gdepth=0, gprows=(), vrspec=())
        scan = self._scan_program(B=mapped.shape[1], S=S, T=T, TCe=TCe,
                                  NT=NT, G=G, Msr=Msr, log2m=et.log2m,
                                  big_m=big_m, n_extra=len(extra), **gkw)
        packed, nb_ts, excw, states, round_base, totals = scan(
            mapped, k, b, jnp.asarray(n_sec), t1, t2, tb, *extra)
        round_base = np.asarray(round_base)
        totals = np.asarray(totals)

        # one t_sec across the mesh, validated against EVERY device's
        # byte distribution (min of per-device choices could straddle
        # an unvalidated cut and exceed the VMEM section cap)
        t_sec, sec_lens = framing.choose_sections_joint(
            [round_base[d][::6] for d in range(D)],
            [int(totals[d]) for d in range(D)], T)
        NSEC = len(sec_lens[0])
        NR = tables.max_renorm_rounds(et.log2m)
        NE = int(jnp.max(nb_ts))
        from ..ops import pallas_place
        Gp = pallas_place.cap_batch_g(G, NR, NE, S)
        while t_sec % Gp:
            Gp //= 2
        CH = NR + NE
        WIN = -(-(Gp * CH * S) // 512) + 2
        sw_bytes = max(int(sl.max()) for sl in sec_lens) + WIN * 512
        sw_bytes = -(-sw_bytes // (128 * 1024)) * (128 * 1024)
        SWr = sw_bytes // 512
        place = self._place_program(S=S, T=T, t_sec=t_sec, NSEC=NSEC,
                                    SWr=SWr, WIN=WIN, G=Gp, NR=NR, NE=NE)
        secs = place(packed, nb_ts, excw, jnp.asarray(n_sec))
        return (np.asarray(secs), np.asarray(states).view(np.uint32),
                t_sec, sec_lens)

    def decode(self, blob: bytes, n: int | None = None) -> np.ndarray:
        magic, ver, kind_id, fid, h_app, n_stored, D = struct.unpack_from(
            "<IBBBBII", blob, 0)
        if magic != MAGIC:
            raise ValueError("not an ATFB container")
        kind = _KIND_NAMES[kind_id]
        if kind != self.kind or fid != self.fidelity:
            raise ValueError(
                f"container method {kind}/{fid} does not match codec "
                f"{self.kind}/{self.fidelity}")
        if n is not None and n != n_stored:
            # the stream is cut into D per-device sections of
            # ceil(n_stored/D); a different n re-derives a different
            # split and silently interleaves wrong ranges
            raise ValueError(
                f"ATFB containers are not prefix-decodable: n={n} != "
                f"stored n={n_stored}")
        n = n_stored
        pos = 16
        mf = None
        if kind == "rfold":
            (do_reorder,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            thres = fold_threshold(fid)
            if do_reorder == 1:
                mf = np.frombuffer(blob, dtype="<u4", count=thres,
                                   offset=pos)
                pos += 4 * thres
        (plen,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        nfreqs, _ = load_prelude(blob[pos:pos + plen + 8])
        pos += plen

        syms = np.arange(len(nfreqs), dtype=np.uint32)
        if kind == "int":
            # tail-escape / grouped / plain, derived from the prelude
            # exactly like the unblocked codec
            from ..models.ans import _int_dec_table
            dt = _int_dec_table(nfreqs)
        else:
            from ..ops import grouped as grouped_mod
            layout = (grouped_mod.build_group_layout(nfreqs)
                      if grouped_mod.use_grouped_layout(nfreqs) else None)
            if kind == "msb":
                high = map_np.msb_unmap_high(syms)
                nb = map_np.msb_exception_bytes(syms)
            else:  # fold / rfold
                high, nb = map_np.fold_unmap_high(syms, fid)
                if kind == "rfold":
                    thres = fold_threshold(fid)
                    if mf is not None:
                        high = np.where(
                            syms < thres, mf[np.minimum(syms, thres - 1)],
                            high - np.uint32(thres)).astype(np.uint32)
                    else:
                        high = np.where(syms < thres, syms,
                                        high).astype(np.uint32)
            dt = tables.build_dec_table(nfreqs, high, nb, layout=layout,
                                        slots=layout is None)
        has_exc = dt.has_exc

        B = -(-n // D)
        n_sec = np.clip(n - B * np.arange(D), 0, B).astype(np.int32)
        secs = []
        for _ in range(D):
            (slen,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            secs.append(framing.parse(blob[pos:pos + slen], 0))
            pos += slen
        S = secs[0][0]
        T = lane_codec.lane_steps(B, S)

        if self.engine == "pallas":
            out = self._decode_pallas(secs, dt, n_sec, S=S, T=T,
                                      has_exc=has_exc)
            if out is not None:
                parts = [out[d].reshape(-1)[:n_sec[d]] for d in range(D)]
                return np.concatenate(parts).astype(np.uint32)[:n]

        maxp = max(len(s[2]) for s in secs) + 8
        stream = np.zeros((D, maxp), dtype=np.uint8)
        states = np.zeros((D, S), dtype=np.uint32)
        for d, (_, st, pay, _t_sec, _sec_len) in enumerate(secs):
            stream[d, :len(pay)] = pay
            states[d] = st
        dt = tables.materialize_slots(dt)  # XLA engine reads slot arrays
        dummy = np.zeros(1, np.uint32)
        out = self._decode_program(S, T, dt.log2m, has_exc)(
            jnp.asarray(stream),
            jnp.asarray(states), jnp.asarray(n_sec),
            jnp.asarray(dt.freq), jnp.asarray(dt.offset),
            jnp.asarray(dt.sym),
            jnp.asarray(dt.high if has_exc else dummy),
            jnp.asarray(dt.nb if has_exc else dummy))
        out = np.asarray(out)  # (D, T, S)
        parts = [out[d].reshape(-1)[:n_sec[d]] for d in range(D)]
        return np.concatenate(parts).astype(np.uint32)[:n]

    def _decode_pallas(self, secs, dt, n_sec, *, S, T, has_exc):
        """Per-device production decode kernels inside one shard_map
        program; returns (D, >=T*S) u32 host array or None when the
        blob/table shape is outside the Pallas envelope (caller falls
        back to the XLA engine)."""
        from ..models import engine as _engine
        from ..ops import pallas_decode
        D = len(secs)
        t_sec0 = secs[0][3]
        if any(s[3] != t_sec0 for s in secs) or S % 128 or S < 128:
            return None
        nsecs = {len(s[4]) for s in secs}
        if len(nsecs) != 1:
            return None
        which = _engine.choose_decode_engine(dt, S)
        if self.interpret and which == "xla":
            # off-TPU choose() always says xla; re-evaluate eligibility
            if dt.layout is not None:
                which = "grouped"
            elif _engine._search_cost(dt) is not None:
                which = "search"
            elif (int(dt.freq.max()) < (1 << 16)
                  and dt.frame_size <= _engine.PALLAS_MAX_FRAME):
                which = "direct"
        if which == "xla":
            return None
        if which == "direct":
            dt = tables.materialize_slots(dt)
        NR = tables.max_renorm_rounds(dt.log2m)
        gt = None
        if which == "grouped":
            from ..ops import grouped as grouped_mod
            gt = grouped_mod.build_group_table(dt.layout, dt.sym_high,
                                               dt.sym_nb)
            NE = gt.max_nb if gt.has_exc else 0
        else:
            NE = int(dt.nb.max()) if has_exc else 0
        WR = -(-(512 + (NR + NE) * S) // 512) + 1
        sw = max(int(np.asarray(s[4]).max()) for s in secs) + WR * 512
        sw = -(-sw // (128 * 1024)) * (128 * 1024)
        streams, states = [], []
        kw = None
        tabs = ()
        st_tab = None
        if which == "search":
            st_tab = tables.build_search_table(dt.nfreqs, dt.sym_high,
                                               dt.sym_nb)
        for d, (_, st, pay, t_sec, sec_len) in enumerate(secs):
            # to_device=False: the per-device buffers stay numpy and
            # upload ONCE as the stacked (D, ...) arrays below (staging
            # device-side would round-trip every stream through the
            # slow relay: H2D here, D2H at np.stack, H2D again)
            if which == "grouped":
                args, kw_d = pallas_decode.stage_grouped(
                    np.asarray(pay), st, gt, int(n_sec[d]), S=S, T=T,
                    t_sec=t_sec, sec_len=sec_len, sw_bytes=sw,
                    to_device=False, interpret=self.interpret)
            elif which == "search":
                args, kw_d = pallas_decode.stage_search(
                    np.asarray(pay), st, st_tab, int(n_sec[d]), S=S, T=T,
                    t_sec=t_sec, sec_len=sec_len, sw_bytes=sw,
                    to_device=False, interpret=self.interpret)
            else:
                args, kw_d = pallas_decode.stage(
                    np.asarray(pay), st, dt, int(n_sec[d]), S=S, T=T,
                    has_exc=has_exc, t_sec=t_sec, sec_len=sec_len,
                    sw_bytes=sw, to_device=False,
                    interpret=self.interpret)
            streams.append(args[0])
            states.append(args[1])
            if kw is None:
                kw, tabs = kw_d, args[3:]
        fn = {"grouped": pallas_decode._call_grouped,
              "search": pallas_decode._call_search}.get(
                  which, pallas_decode._call)
        prog = self._pallas_decode_program(fn, kw, len(tabs))
        out = prog(jnp.asarray(np.stack(streams)),
                   jnp.asarray(np.stack(states)),
                   jnp.asarray(n_sec), *tabs)
        return np.asarray(out)


def encode_blocked(values, method="ANSfold-2", mesh=None, lanes=None):
    return BlockCodec(method, mesh, lanes).encode(values)


def decode_blocked(blob, n=None, method="ANSfold-2", mesh=None, lanes=None):
    return BlockCodec(method, mesh, lanes).decode(blob, n)
