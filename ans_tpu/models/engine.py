"""Decode-engine dispatch: Pallas TPU kernel when profitable, XLA scan
otherwise (CPU backend, oversized frames, or non-power-of-128 lanes)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lane_codec, tables

# largest frame the shuffle-based Pallas table lookup handles well
# (cost is ~M/65536 cycles/symbol; 2^16 ~= 1 cycle/symbol)
PALLAS_MAX_FRAME = 1 << 16


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


def decode(payload: np.ndarray, states: np.ndarray, dt: tables.DecTable,
           n: int, *, S: int, T: int, has_exc: bool,
           t_sec: int | None = None, sec_len=None):
    if t_sec is not None and _pallas_ok(dt, S):
        from ..ops import pallas_decode
        return pallas_decode.decode(payload, states, dt, n, S=S, T=T,
                                    has_exc=has_exc, t_sec=t_sec,
                                    sec_len=sec_len)
    stream = np.concatenate([payload, np.zeros(8, np.uint8)])
    dummy = np.zeros(1, np.uint32)
    return lane_codec.decode_lanes(
        jnp.asarray(stream), jnp.asarray(states),
        jnp.asarray(dt.freq), jnp.asarray(dt.offset), jnp.asarray(dt.sym),
        jnp.asarray(dt.high if has_exc else dummy),
        jnp.asarray(dt.nb if has_exc else dummy),
        jnp.int32(n), S=S, T=T, log2m=dt.log2m, has_exc=has_exc)
