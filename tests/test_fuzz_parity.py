"""A quick slice of the differential fuzzer (tools/fuzz_parity.py) so
the suite continuously cross-checks random cases against the REAL
reference coders, not just the 14 committed fixture blobs.  Skipped
when the reference tree or g++ is unavailable."""

import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                       / "tools"))

import fuzz_parity as fp  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir(fp.REF_INCLUDE) or shutil.which("g++") is None,
    reason="reference tree or g++ unavailable")


@pytest.fixture(scope="module")
def ref_dump():
    return fp.build_ref_dump()


# fixed seeds -> deterministic cases; small n keeps this under ~20s
QUICK = [("int", 11), ("msb", 12), ("fold2", 13), ("fold8", 14),
         ("rfold2", 15), ("sint80", 16), ("smsb320", 17),
         ("byte", 18), ("shuff", 19)]


@pytest.mark.parametrize("method,seed", QUICK)
def test_differential_parity_quick(method, seed, ref_dump, tmp_path):
    rng = np.random.default_rng(seed)
    for _ in range(3):
        name, data = fp.gen_case(rng, method)
        data = data[:5000]
        if len(np.unique(data)) < 2:
            data[0] ^= 1
        r = fp.run_case(method, name, data, str(tmp_path))
        assert r in ("ok", "ref-defect"), f"{method} {name}: {r}"


def test_reference_defect_detected(ref_dump, tmp_path):
    """Values >= 2^30 through fold: the reference mis-decodes its own
    blob (docs/FORMAT.md defect); the fuzzer must classify that as a
    reference defect and prove OUR codec still round-trips."""
    rng = np.random.default_rng(0)
    data = rng.integers(1 << 30, 1 << 31, size=2000).astype(np.uint32)
    r = fp.run_case("fold2", "huge-forced", data, str(tmp_path))
    assert r == "ref-defect"


def test_cross_decode_is_checked(ref_dump, tmp_path):
    """Sanity that the harness really exercises both cross directions
    (our decode of the reference blob, reference decode of ours)."""
    rng = np.random.default_rng(3)
    data = np.minimum(rng.zipf(1.3, size=4000) - 1, 65535).astype(
        np.uint32)
    assert fp.run_case("msb", "zipf16", data, str(tmp_path)) == "ok"
    blob = fp.ref_encode("msb", data, str(tmp_path))
    out = fp.ref_decode("msb", blob, len(data), str(tmp_path))
    np.testing.assert_array_equal(out, data)
