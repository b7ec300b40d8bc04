"""Round-trip + format tests for the S-lane TPU engine (ops.lane_codec,
models.ans) on the CPU backend.

Mirrors the reference's REQUIRE_EQUAL-after-decode strategy
(reference: src/table_efficiency.cpp:104-106) plus lane-format-specific
properties: compressed size stays within the lane directory overhead of
the compat format, and streams decode independently of lane count used
elsewhere.
"""

import numpy as np
import pytest

from ans_tpu import models
from ans_tpu.models import config, framing
from ans_tpu.reference_model import rans_compat as rc

LANES = 64  # fixed for tests: bounds jit cache growth


def _lane(name):
    c = models.get(name, "lane")
    c.lanes = LANES
    return c


def _roundtrip(codec, values):
    blob = codec.encode(values)
    out = codec.decode(blob, len(values))
    np.testing.assert_array_equal(out, values)
    return blob


@pytest.mark.parametrize("name", ["zipf12", "geometric", "uniform_small",
                                  "tiny", "single_sym"])
def test_lane_ans_int(datasets, name):
    _roundtrip(_lane("ANS"), datasets[name])


@pytest.mark.parametrize("name", ["zipf12", "zipf_large", "geometric",
                                  "wide", "tiny", "single_sym"])
def test_lane_ans_msb(datasets, name):
    _roundtrip(_lane("ANSmsb"), datasets[name])


@pytest.mark.parametrize("fidelity", [1, 2, 3, 4, 8])
def test_lane_ans_fold(datasets, fidelity):
    _roundtrip(_lane(f"ANSfold-{fidelity}"), datasets["zipf_large"])
    _roundtrip(_lane(f"ANSfold-{fidelity}"), datasets["wide"])


@pytest.mark.parametrize("fidelity", [1, 2, 4])
def test_lane_ans_rfold(datasets, fidelity):
    _roundtrip(_lane(f"ANSrfold-{fidelity}"), datasets["zipf12"])
    _roundtrip(_lane(f"ANSrfold-{fidelity}"), datasets["zipf_large"])


@pytest.mark.parametrize("h", [1, 80, 320])
def test_lane_sint_smsb(datasets, h):
    _roundtrip(_lane(f"ANSsint-{h}"), datasets["zipf12"])
    _roundtrip(_lane(f"ANSsmsb-{h}"), datasets["zipf_large"])


def test_lane_edge_cases():
    for vals in [np.array([7], dtype=np.uint32),
                 np.full(3, 9, np.uint32),
                 np.arange(LANES, dtype=np.uint32),          # exactly S
                 np.arange(LANES + 1, dtype=np.uint32),      # S + 1
                 np.full(1000, 0, np.uint32),
                 np.array([0xFFFFFFFF, 0, 0xFFFFFFFF, 1], np.uint32)]:
        for name in ["ANS", "ANSmsb", "ANSfold-3", "ANSrfold-1"]:
            if name == "ANS" and vals.max() > (1 << 22):
                continue  # fmt A frame cap; huge raw alphabets use msb/fold
            _roundtrip(_lane(name), vals)


def test_lane_empty_raises():
    with pytest.raises(ValueError):
        _lane("ANSmsb").encode(np.empty(0, np.uint32))


def test_lane_size_near_compat(datasets):
    """Lane BPI <= compat BPI + directory overhead (8-bit renorm can only
    tighten the stream vs 32-bit renorm)."""
    v = datasets["zipf_large"]
    for name, compat in [("ANSmsb", rc.AnsMsb()), ("ANSfold-2", rc.AnsFold(2))]:
        lane_blob = _lane(name).encode(v)
        compat_blob = compat.encode(v)
        slack = framing.overhead_bytes(LANES) + 8
        assert len(lane_blob) <= len(compat_blob) + slack


def test_lane_count_config():
    assert config.default_lane_count(100) == 32
    assert config.default_lane_count(100_000_000) == 4096  # capped
    assert config.default_lane_count(20_000_000) == 2048
    s = config.default_lane_count(10_000_000)
    assert s & (s - 1) == 0


def test_decode_is_size_directed(datasets):
    """Decoding a prefix: caller-supplied n governs output length (the
    reference contract; streams are not self-terminating)."""
    v = datasets["zipf12"]
    blob = _lane("ANSmsb").encode(v)
    out = _lane("ANSmsb").decode(blob, len(v))
    assert len(out) == len(v)


def test_prepared_decoder_api(datasets):
    """PreparedDecoder: stage once, decode repeatedly (serving path)."""
    from ans_tpu.models import framing
    from ans_tpu.models.engine import PreparedDecoder
    from ans_tpu.ops import lane_codec, tables
    from ans_tpu.reference_model import mappings as map_np
    from ans_tpu.reference_model.model import load_prelude

    v = datasets["zipf_large"]
    codec = _lane("ANSfold-2")
    blob = codec.encode(v)
    nfreqs, plen = load_prelude(blob)
    syms = np.arange(len(nfreqs), dtype=np.uint32)
    high, nb = map_np.fold_unmap_high(syms, 2)
    dt = tables.build_dec_table(nfreqs, high, nb)
    S, states, payload, t_sec, sec_len = framing.parse(blob, plen)
    prep = PreparedDecoder(payload, states, dt, len(v), S=S,
                           T=lane_codec.lane_steps(len(v), S),
                           has_exc=True, t_sec=t_sec, sec_len=sec_len)
    for _ in range(2):  # re-runnable without re-staging
        np.testing.assert_array_equal(prep.to_host(prep()), v)


def test_choose_sections_joint_respects_cap_for_every_device():
    """min() of per-device choose_sections results can straddle an
    unvalidated cut and reach ~2x the cap (regression).  The joint
    chooser must return one t_sec whose sections respect the cap on
    EVERY device's byte distribution."""
    from ans_tpu.models import framing
    cap = 1000
    T = 320
    # device A: bytes concentrated right around step 160 (its own
    # choice would be t_sec=160: sections [0,160) and [160,320) both
    # just under the cap)
    base_a = np.zeros(T, dtype=np.int64)
    base_a[128:160] = np.linspace(0, 999, 32, dtype=np.int64)
    base_a[160:192] = 999 + np.linspace(0, 999, 32, dtype=np.int64)
    base_a[192:] = 1998
    # device B: uniform spread, forces a smaller t_sec
    base_b = np.linspace(0, 12000, T, endpoint=False, dtype=np.int64)
    t_sec, lens = framing.choose_sections_joint(
        [base_a, base_b], [1998, 12000], T, cap_bytes=cap, quantum=32)
    for ln in lens:
        assert ln.max() <= cap or t_sec == 32
    assert T % t_sec == 0 or t_sec == 32
    # per-device totals preserved
    assert int(lens[0].sum()) == 1998
    assert int(lens[1].sum()) == 12000
