"""Pallas byte-split kernels (ops/pallas_bytesplit) vs the XLA
reference implementations (ops/bytesplit), interpret mode on CPU.

The wire formats are fixed (vbyte: include/vbyte.hpp 7-bit varints;
streamvbyte: lemire control+data layout), so encode must be BYTE-EXACT
against the XLA versions and decode must invert real streams — the
routing/expansion networks have no tolerance for near-misses.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from ans_tpu.ops import bytesplit as bs
from ans_tpu.ops import pallas_bytesplit as pb


def _mixed(rng, n):
    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    m = rng.random(n)
    return np.where(m < .5, x & 0x7F,
                    np.where(m < .8, x & 0xFFFF, x)).astype(np.uint32)


@pytest.mark.parametrize("n", [100, 5000, 70000])
@pytest.mark.parametrize("vbyte", [False, True])
def test_split_encode_byte_exact(n, vbyte):
    x = _mixed(np.random.default_rng(n), n)
    out, tots = pb.split_encode(x, n, vbyte=vbyte, E=1 << 12,
                                interpret=True)
    got = pb.sections_to_bytes(out, tots)
    if vbyte:
        ref, total = bs.vbyte_encode(jnp.asarray(x))
    else:
        _, ref, total = bs.svb_encode(jnp.asarray(x))
    np.testing.assert_array_equal(got, np.asarray(ref[: int(total)]))


@pytest.mark.parametrize("n", [100, 5000, 70000])
def test_svb_decode_kernel(n):
    x = _mixed(np.random.default_rng(n + 1), n)
    ctrl = np.asarray(pb.svb_control(jnp.asarray(x)))
    _, data, total = bs.svb_encode(jnp.asarray(x))
    out = pb.svb_decode(ctrl, np.asarray(data[: int(total)]), n,
                        T_SEC=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:n], x)


@pytest.mark.parametrize("n", [100, 4096, 50000])
def test_vbyte_decode_kernel(n):
    """Exercises the terminator scans + MSB-first expansion router and
    the cursor carry across DMA windows (GD=2 -> many windows)."""
    x = _mixed(np.random.default_rng(n + 2), n)
    ref, total = bs.vbyte_encode(jnp.asarray(x))
    data = np.asarray(ref[: int(total)])
    out = pb.vbyte_decode(data, n, GD=2, interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:n], x)


@pytest.mark.parametrize("kmax", [1, 2, 3, 4, 5])
def test_vbyte_decode_every_target_density(kmax):
    """The route target density K is the data's max element length
    (vbyte_stage terminator scan); every K in 1..5 must route and
    collapse correctly, including elements shorter than K and window
    crossings."""
    rng = np.random.default_rng(kmax)
    hi = min((1 << (7 * kmax)) - 1, (1 << 32) - 1)
    x = rng.integers(0, hi + 1, size=9000, dtype=np.uint64).astype(
        np.uint32)
    x[0] = hi  # pin the max length to exactly kmax
    ref, total = bs.vbyte_encode(jnp.asarray(x))
    args, kw = pb.vbyte_stage(np.asarray(ref[: int(total)]), len(x),
                              GD=2, interpret=True)
    assert kw["K"] == kmax
    out = pb._vb_dec_call(*args, **kw)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[: len(x)],
                                  x)


def test_vbyte_decode_rowmm(monkeypatch):
    """ANS_TPU_VB_ROWMM: the terminator prefix's row pass as a hoisted
    tri-mask MXU matmul must be value-identical to the roll rounds."""
    monkeypatch.setenv("ANS_TPU_VB_ROWMM", "1")
    n = 50000
    x = _mixed(np.random.default_rng(n + 2), n)
    ref, total = bs.vbyte_encode(jnp.asarray(x))
    args, kw = pb.vbyte_stage(np.asarray(ref[: int(total)]), n, GD=2,
                              interpret=True)
    assert kw["rowmm"] and len(args) == 2
    out = pb._vb_dec_call(*args, **kw)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[:n], x)


def test_vbyte_decode_window_alignment():
    """All-5-byte values stress the window/base normalization (cursor
    lands mid-row constantly)."""
    rng = np.random.default_rng(9)
    x = (rng.integers(1 << 28, 1 << 32, size=9000, dtype=np.uint64)
         .astype(np.uint32))
    ref, total = bs.vbyte_encode(jnp.asarray(x))
    out = pb.vbyte_decode(np.asarray(ref[: int(total)]), len(x), GD=2,
                          interpret=True)
    np.testing.assert_array_equal(np.asarray(out).reshape(-1)[: len(x)],
                                  x)
