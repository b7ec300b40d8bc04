"""Pseudo-adaptive block codec tests (paper Figure 13 workload).

The reference's pseudo_adaptive.cpp is encode-only; these tests cover the
full round-trip our implementation adds, plus the single-symbol-block
shortcut (pseudo_adaptive.cpp:120) and the BPI-vs-block-size tradeoff.
"""

import numpy as np
import pytest

from ans_tpu.models.pseudo_adaptive import PseudoAdaptive


@pytest.fixture(scope="module")
def drifting():
    """Input whose local statistics drift, so per-block models win."""
    rng = np.random.default_rng(3)
    parts = []
    for i in range(8):
        base = i * 1000
        parts.append(rng.integers(base, base + 50, size=4000))
    return np.concatenate(parts).astype(np.uint32)


@pytest.mark.parametrize("kind", ["int", "msb"])
@pytest.mark.parametrize("block_size", [128, 4096, 1 << 20])
def test_roundtrip(drifting, kind, block_size):
    codec = PseudoAdaptive(block_size, kind, lanes=32)
    blob = codec.encode(drifting)
    np.testing.assert_array_equal(codec.decode(blob, len(drifting)),
                                  drifting)


def test_single_symbol_blocks():
    v = np.repeat(np.arange(16, dtype=np.uint32), 128)  # 1 symbol per block
    codec = PseudoAdaptive(128, "int", lanes=32)
    blob = codec.encode(v)
    # each block stores only sigma=1 + the symbol: tiny
    assert len(blob) < 16 + 16 * 8
    np.testing.assert_array_equal(codec.decode(blob), v)


def test_adaptive_beats_global_on_drifting_data(drifting):
    from ans_tpu import models
    codec = PseudoAdaptive(4096, "int", lanes=32)
    adaptive = len(codec.encode(drifting))
    global_ = len(models.get("ANS", "compat").encode(drifting))
    assert adaptive < global_
