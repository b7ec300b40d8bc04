"""Device kernels for byte-splitting integer codecs: vbyte + streamvbyte.

The reference wraps external C libraries for these
(reference: include/methods.hpp:38-59 FastPFor VariableByte,
:89-102 lemire/streamvbyte); here they are data-parallel jnp programs —
length computation, cumulative-sum placement, one scatter for encode;
terminator detection / control-byte expansion + gather for decode.

Wire formats:
  * vbyte: per-int 7-bit groups LSB-first; 0x80 continuation bit set on
    every byte except the last of a value (include/vbyte.hpp:32-95).
  * streamvbyte: ceil(n/4) control bytes (2 bits per int = data length-1),
    then each value's 1-4 little-endian data bytes (lemire layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

U32 = jnp.uint32
U8 = jnp.uint8


# --------------------------------------------------------------------------
# vbyte
# --------------------------------------------------------------------------

def _vbyte_len(x):
    return (jnp.uint32(1) + (x >= 1 << 7) + (x >= 1 << 14)
            + (x >= 1 << 21) + (x >= 1 << 28)).astype(jnp.int32)


@jax.jit
def vbyte_encode(x):
    """(n,) u32 -> (bytes (5n,) u8, total i32). Valid prefix = total."""
    x = x.astype(U32)
    n = x.shape[0]
    ln = _vbyte_len(x)
    end = jnp.cumsum(ln)
    start = end - ln
    total = end[-1] if n else jnp.int32(0)
    out = jnp.zeros((5 * n,), U8)
    for j in range(5):
        live = j < ln
        more = (j + 1) < ln
        byte = ((x >> jnp.uint32(7 * j)) & jnp.uint32(0x7F)) | \
            jnp.where(more, jnp.uint32(0x80), jnp.uint32(0))
        idx = jnp.where(live, start + j, 5 * n)
        out = out.at[idx].set(byte.astype(U8), mode="drop")
    return out, total


@functools.partial(jax.jit, static_argnames=("n",))
def vbyte_decode(buf, *, n):
    """(B,) u8 (>= total bytes, padded) -> (n,) u32."""
    b = buf.astype(U32)
    term = (b & 0x80) == 0
    end = jnp.nonzero(term, size=n, fill_value=buf.shape[0] - 1)[0]
    start = jnp.concatenate([jnp.zeros(1, end.dtype), end[:-1] + 1])
    ln = (end - start + 1).astype(jnp.int32)
    val = jnp.zeros((n,), U32)
    for j in range(5):
        live = j < ln
        byte = b[jnp.minimum(start + j, buf.shape[0] - 1)] & 0x7F
        val = val | jnp.where(live, byte << jnp.uint32(7 * j),
                              jnp.uint32(0))
    return val


# --------------------------------------------------------------------------
# streamvbyte
# --------------------------------------------------------------------------

def _svb_len(x):
    return (jnp.uint32(1) + (x > 0xFF) + (x > 0xFFFF)
            + (x > 0xFFFFFF)).astype(jnp.int32)


@jax.jit
def svb_encode(x):
    """(n,) u32 -> (control (ceil(n/4),) u8, data (4n,) u8, total i32)."""
    x = x.astype(U32)
    n = x.shape[0]
    ln = _svb_len(x)
    key = (ln - 1).astype(U32)
    nc = -(-n // 4)
    keys = jnp.zeros((nc * 4,), U32).at[jnp.arange(n)].set(key)
    k4 = keys.reshape(nc, 4)
    control = (k4[:, 0] | (k4[:, 1] << 2) | (k4[:, 2] << 4)
               | (k4[:, 3] << 6)).astype(U8)
    end = jnp.cumsum(ln)
    start = end - ln
    total = end[-1] if n else jnp.int32(0)
    data = jnp.zeros((4 * n,), U8)
    for j in range(4):
        live = j < ln
        byte = ((x >> jnp.uint32(8 * j)) & jnp.uint32(0xFF)).astype(U8)
        idx = jnp.where(live, start + j, 4 * n)
        data = data.at[idx].set(byte, mode="drop")
    return control, data, total


@functools.partial(jax.jit, static_argnames=("n",))
def svb_decode(control, data, *, n):
    """control (ceil(n/4),) u8 + data (B,) u8 padded -> (n,) u32."""
    c = control.astype(U32)
    keys = jnp.stack([c & 3, (c >> 2) & 3, (c >> 4) & 3, (c >> 6) & 3],
                     axis=-1).reshape(-1)[:n]
    ln = (keys + 1).astype(jnp.int32)
    end = jnp.cumsum(ln)
    start = end - ln
    d = data.astype(U32)
    val = jnp.zeros((n,), U32)
    for j in range(4):
        live = j < ln
        byte = d[jnp.minimum(start + j, data.shape[0] - 1)]
        val = val | jnp.where(live, byte << jnp.uint32(8 * j),
                              jnp.uint32(0))
    return val
