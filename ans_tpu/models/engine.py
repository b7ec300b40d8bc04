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


def encode_pallas_ok(et: tables.EncTable, S: int) -> bool:
    """Pallas encode scan applies when the table packs into u16 fields
    (freq<<16|base needs M <= 2^16), ub stays below 2^31 (max freq < M),
    and lanes fill whole vector rows."""
    if os.environ.get("ANS_TPU_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if S % 128 or S < 128:
        return False
    M = et.frame_size
    if M < 2 or M > (1 << 16):
        return False
    return int(et.freq.max()) < M


def _pallas_ok(dt: tables.DecTable, S: int) -> bool:
    if os.environ.get("ANS_TPU_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if S % 128 or S < 128:
        return False
    if int(dt.freq.max()) >= 1 << 16:
        return False  # freq|offset word packing needs u16 fields
    return dt.frame_size <= PALLAS_MAX_FRAME


class PreparedDecoder:
    """All decode inputs staged on device; call to run the kernel."""

    def __init__(self, payload: np.ndarray, states: np.ndarray,
                 dt: tables.DecTable, n: int, *, S: int, T: int,
                 has_exc: bool, t_sec: int, sec_len):
        self.n, self.S, self.T = n, S, T
        self.use_pallas = t_sec is not None and _pallas_ok(dt, S)
        if self.use_pallas:
            from ..ops import pallas_decode
            (self._args, self._kw) = pallas_decode.stage(
                payload, states, dt, n, S=S, T=T, has_exc=has_exc,
                t_sec=t_sec, sec_len=sec_len)
            self._fn = pallas_decode._call
        else:
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
           t_sec: int | None = None, sec_len=None):
    prep = PreparedDecoder(payload, states, dt, n, S=S, T=T,
                           has_exc=has_exc, t_sec=t_sec, sec_len=sec_len)
    return prep()
