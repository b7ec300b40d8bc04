"""Public staging APIs: models.prepare_decoder / prepare_encoder.

These are the serving entry points (and what every bench tool now
runs), so the suite binds them directly: container identity with the
one-shot codec, engine forcing, interpreter-mode kernels, and clean
rejection of bad inputs.
"""

import os

import numpy as np
import pytest

from ans_tpu import models
from ans_tpu.models.ans import AnsFold


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    return (rng.zipf(1.3, size=30000) - 1).clip(0, 1 << 27).astype(
        np.uint32)


def test_prepare_decoder_xla_and_kernel(data):
    blob = AnsFold(2, lanes=256).encode(data)
    prep = models.prepare_decoder("ANSfold-2", blob, len(data))
    assert prep.engine == "xla"  # cpu backend -> xla
    np.testing.assert_array_equal(prep.to_host(prep()), data)
    prep2 = models.prepare_decoder("ANSfold-2", blob, len(data), TC=32,
                                   engine="search", interpret=True)
    np.testing.assert_array_equal(prep2.to_host(prep2()), data)


def test_prepare_decoder_rejects(data):
    blob = AnsFold(2).encode(data[:4000])  # default lanes: S=32
    with pytest.raises(KeyError):
        models.prepare_decoder("vbyte", blob, 4000)
    with pytest.raises(ValueError):
        models.prepare_decoder("ANSfold-2", blob, 4000, engine="search")


def test_prepare_encoder_container_identity(data):
    os.environ["ANS_TPU_INTERPRET"] = "1"
    try:
        pe = models.prepare_encoder("ANSfold-2", data, lanes=256)
        full = pe.prelude + pe.to_bytes(*pe())
    finally:
        del os.environ["ANS_TPU_INTERPRET"]
    codec = AnsFold(2, lanes=256)
    assert bytes(full) == bytes(codec.encode(data))
    np.testing.assert_array_equal(codec.decode(full, len(data)), data)


def test_prepare_encoder_needs_envelope(data):
    # cpu backend without ANS_TPU_INTERPRET: no Pallas encode path
    with pytest.raises(ValueError):
        models.prepare_encoder("ANSfold-2", data, lanes=256)
