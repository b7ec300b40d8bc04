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

Wire format ("ATFB" container): see docs/FORMAT.md section 3.
"""

from __future__ import annotations

import functools
import struct

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..constants import MSB_MAX_SIGMA, fold_max_sigma
from ..ops import lane_codec, mappings_jax as mj, tables
from ..reference_model import mappings as map_np
from ..reference_model.model import (adjust_freqs, load_prelude,
                                     serialize_prelude)
from . import _shard_map
from ..models import config, framing

MAGIC = 0x41544642  # "BFTA" little-endian -> "ATFB"

KINDS = {"int": 0, "msb": 1, "fold": 2}


def make_mesh(n_devices: int | None = None, axis: str = "blocks") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _parse_method(method: str):
    if method == "ANS":
        return "int", 0
    if method == "ANSmsb":
        return "msb", 0
    if method.startswith("ANSfold-"):
        return "fold", int(method.split("-")[1])
    raise ValueError(f"blocked runtime supports ANS/ANSmsb/ANSfold-f, "
                     f"not {method!r}")


class BlockCodec:
    """Shared-model, block-parallel encode/decode over a mesh."""

    def __init__(self, method: str = "ANSfold-2", mesh: Mesh | None = None,
                 lanes: int | None = None, h_approx: int = 1):
        self.kind, self.fidelity = _parse_method(method)
        self.method = method
        self.mesh = mesh or make_mesh()
        self.lanes = lanes
        self.h_approx = h_approx
        self.axis = self.mesh.axis_names[0]
        self._programs = {}  # (stage, *static_params) -> jitted program

    def _cached(self, key, build):
        if key not in self._programs:
            self._programs[key] = build()
        return self._programs[key]

    # -- device programs ---------------------------------------------------

    @functools.cached_property
    def _sigma_cap(self):
        if self.kind == "msb":
            return MSB_MAX_SIGMA
        if self.kind == "fold":
            return fold_max_sigma(self.fidelity)
        return None

    def _map_hist_program(self, sigma_cap: int):
        """(D, B) u32 -> mapped/k/b sharded + replicated global histogram."""
        kind, fid, axis = self.kind, self.fidelity, self.axis

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

    # -- host orchestration ------------------------------------------------

    def encode(self, values) -> bytes:
        values = np.ascontiguousarray(values, dtype=np.uint32)
        n = len(values)
        if n == 0:
            raise ValueError("cannot encode an empty sequence")
        D = self.mesh.devices.size
        B = -(-n // D)
        vals = np.zeros(D * B, dtype=np.uint32)
        vals[:n] = values
        vals = vals.reshape(D, B)
        n_sec = np.clip(n - B * np.arange(D), 0, B).astype(np.int32)

        sigma_cap = self._sigma_cap or (int(values.max()) + 1)
        mapped, k, b, hist = self._map_hist_program(sigma_cap)(vals)
        freqs = np.asarray(hist).astype(np.uint64)
        max_sym = int(np.flatnonzero(freqs)[-1])
        nfreqs = adjust_freqs(freqs, max_sym, self.kind != "int",
                              self.h_approx)
        prelude = serialize_prelude(nfreqs, int(nfreqs.sum()))
        et = tables.build_enc_table(nfreqs)

        S = self.lanes or config.default_lane_count(B)
        T = lane_codec.lane_steps(B, S)
        # stage (T, S) per section on device
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

        out = bytearray()
        out += struct.pack("<IBBBBII", MAGIC, 1, KINDS[self.kind],
                           self.fidelity, 0, n, D)
        out += struct.pack("<I", len(prelude)) + prelude
        for d in range(D):
            t_sec, sec_len = framing.choose_sections(
                step_base[d], int(totals[d]), T)
            sec = framing.pack(states[d],
                               np.asarray(stream[d, : int(totals[d])]),
                               t_sec, sec_len)
            out += struct.pack("<I", len(sec)) + sec
        return bytes(out)

    def decode(self, blob: bytes, n: int | None = None) -> np.ndarray:
        magic, ver, kind_id, fid, _, n_stored, D = struct.unpack_from(
            "<IBBBBII", blob, 0)
        if magic != MAGIC:
            raise ValueError("not an ATFB container")
        assert kind_id == KINDS[self.kind] and fid == self.fidelity, \
            "container method does not match codec"
        n = n_stored if n is None else n
        pos = 16
        (plen,) = struct.unpack_from("<I", blob, pos)
        pos += 4
        nfreqs, _ = load_prelude(blob[pos:pos + plen + 8])
        pos += plen

        syms = np.arange(len(nfreqs), dtype=np.uint32)
        if self.kind == "msb":
            dt = tables.build_dec_table(nfreqs, map_np.msb_unmap_high(syms),
                                        map_np.msb_exception_bytes(syms))
        elif self.kind == "fold":
            high, nb = map_np.fold_unmap_high(syms, self.fidelity)
            dt = tables.build_dec_table(nfreqs, high, nb)
        else:
            dt = tables.build_dec_table(nfreqs)
        has_exc = dt.high is not None

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
        maxp = max(len(s[2]) for s in secs) + 8
        stream = np.zeros((D, maxp), dtype=np.uint8)
        states = np.zeros((D, S), dtype=np.uint32)
        for d, (_, st, pay, _t_sec, _sec_len) in enumerate(secs):
            stream[d, :len(pay)] = pay
            states[d] = st
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


def encode_blocked(values, method="ANSfold-2", mesh=None, lanes=None):
    return BlockCodec(method, mesh, lanes).encode(values)


def decode_blocked(blob, n=None, method="ANSfold-2", mesh=None, lanes=None):
    return BlockCodec(method, mesh, lanes).decode(blob, n)
