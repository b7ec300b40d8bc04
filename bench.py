"""Headline benchmark: ANSfold-2 lane-engine decode throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ints/sec", "vs_baseline": N, ...}

Baseline = the unmodified reference C++ ans_fold<2> decoder measured
single-core on this machine (BASELINE_MEASURED.json, produced by
tools/ref_harness.cpp) on the same dataset: zipf(1.25), n = 2^25,
seed 42.

The headline value is the device-resident decode throughput via
models.engine.PreparedDecoder (pivot-search Pallas kernel, honest
frames = the reference's exact adjust_freqs model, clamped only at the
lane format's 2^22 ceiling — a no-op for this dataset): compressed stream
+ tables staged in HBM once, kernel timed over repeat runs (min of
NUM_RUNS).  That matches the production serving pattern.  n = 2^25
because the axon tunnel on this machine adds a ~30 ms fixed sync per
device dispatch (docs/PERF.md) — the C++ baseline is n-independent
(re-measured at 2^25) while small-n TPU runs are dominated by the
relay, not the codec.  Device-resident encode (PreparedEncoder:
scan + placement kernels) and one-shot e2e numbers (host<->device
transfers through the ~45 MB/s tunnel) are reported as extra fields.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Total wall-clock budget for TPU backend availability (the axon relay
# has been observed to block ~27 min inside jax.devices() before
# raising UNAVAILABLE; an unbounded wait would eat the whole round).
INIT_BUDGET_SECS = int(os.environ.get("ANS_TPU_BENCH_INIT_BUDGET", "300"))

_PROBE_SRC = """
import sys
sys.path.insert(0, {root!r})
from ans_tpu import runtime
runtime.enable_compilation_cache()
import jax
d = jax.devices()
print("PROBE_OK", len(d), jax.default_backend())
"""


def wait_for_tpu(budget: float = INIT_BUDGET_SECS):
    """Probe backend availability in bounded subprocesses.

    In-process jax backend init is unbounded (and a failed init is
    cached for the life of the process), so each attempt runs in a
    child under a hard timeout; on success the parent's own init hits
    the now-warm relay.  Returns (ok, waited_secs, last_error)."""
    src = _PROBE_SRC.format(root=os.path.dirname(os.path.abspath(__file__)))
    t0 = time.time()
    last = ""
    backoff = 10.0
    while True:
        left = budget - (time.time() - t0)
        if left <= 1:
            return False, time.time() - t0, last
        try:
            r = subprocess.run([sys.executable, "-c", src],
                               capture_output=True, text=True,
                               timeout=left)
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True, time.time() - t0, ""
            tail = (r.stdout + r.stderr).strip().splitlines()
            last = tail[-1] if tail else f"probe exited rc={r.returncode}"
        except subprocess.TimeoutExpired:
            last = (f"backend init still blocked after {left:.0f}s "
                    "(axon relay unresponsive)")
            return False, time.time() - t0, last
        time.sleep(min(backoff, max(0.0, budget - (time.time() - t0))))
        backoff = min(backoff * 2, 60.0)


def _fail(kind: str, detail: str, waited: float | None = None) -> None:
    """ONE structured JSON line on stderr-free stdout, nonzero exit —
    the driver records rc and the tail; a stack trace after a half-hour
    hang is not a capture (VERDICT r2 item 1)."""
    print(json.dumps({
        "error": kind,
        "detail": detail[-2000:],
        "waited_secs": round(waited, 1) if waited is not None else None,
        "metric": f"{METHOD} decode ints/sec (NOT MEASURED: {kind})",
        "value": None,
        "unit": "ints/sec",
        "vs_baseline": None,
    }))
    sys.exit(2)

# ANS_TPU_BENCH_N: dry-run override (CPU smoke of the full capture
# logic without the chip); the real capture always uses the default.
N = int(os.environ.get("ANS_TPU_BENCH_N", str(1 << 25)))
SEED = 42
NUM_RUNS = 5
METHOD = "ANSfold-2"
# S/TC profile: with the split-window stream gather the per-channel
# window is S-independent-ish (6->10 rows), so larger S amortizes the
# per-step skeleton further: measured 645M at S=4096/TC=128 vs 485-542M
# at S=2048 (docs/PERF.md)
LANES = 4096
TC = 128


def make_data():
    rng = np.random.default_rng(SEED)
    return (rng.zipf(1.25, size=N) - 1).clip(0, (1 << 28) - 1).astype(
        np.uint32)


def _time(f, runs=NUM_RUNS):
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ok, waited, err = wait_for_tpu()
    if not ok:
        _fail("tpu-unavailable", err, waited)
    from ans_tpu import runtime
    runtime.enable_compilation_cache()
    import jax

    from ans_tpu import models
    from ans_tpu.models.ans import AnsFold

    data = make_data()
    codec = AnsFold(2, lanes=LANES, max_frame=None)
    blob = codec.encode(data)                  # warmup + compile
    out = codec.decode(blob, N)
    assert (out == data).all(), "round-trip failed"
    bpi = 8.0 * len(blob) / N

    # decode: stage once, run the pivot-search kernel
    prep = models.prepare_decoder(METHOD, blob, N, TC=TC)
    prep().block_until_ready()
    dec_ips = N / _time(lambda: prep().block_until_ready())

    # encode: device-resident scan + placement
    enc_ips = None
    try:
        pe = models.prepare_encoder(METHOD, data, lanes=LANES)
        jax.block_until_ready(pe())
        enc_ips = N / _time(lambda: jax.block_until_ready(pe()))
    except ValueError:
        pass

    # end-to-end (includes host<->device transfers through the tunnel)
    e2e_enc = _time(lambda: codec.encode(data), 2)
    e2e_dec = _time(lambda: codec.decode(blob, N), 2)

    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")

    # large-alphabet extra row: ANS (ans_int) on zipf-2^20 through the
    # frequency-grouped engine (sigma ~1M; the C++ reference decodes
    # this at 22.9M ints/s, BASELINE_MEASURED large_alphabet).  Failure
    # here must not void the headline capture.
    big = {}
    try:
        from ans_tpu.models.ans import AnsInt
        from ans_tpu.utils import zipf as _zipf
        zdata = _zipf.zipf(np.random.default_rng(0), N, 1 << 20)
        bcodec = AnsInt(lanes=LANES)
        bblob = bcodec.encode(zdata)
        assert (bcodec.decode(bblob, N) == zdata).all()
        bprep = models.prepare_decoder("ANS", bblob, N, TC=TC)
        bprep().block_until_ready()
        bd_ips = N / _time(lambda: bprep().block_until_ready())
        bm = (json.load(open(bp)).get("large_alphabet", {})
              .get("datasets", {}).get("zipf20", {}).get("ANS", {})
              if os.path.exists(bp) else {})
        big = {
            "zipf20_ans_decode_ips": round(bd_ips),
            "zipf20_ans_engine": bprep.engine,
            "zipf20_ans_bpi": round(8.0 * len(bblob) / N, 4),
            "zipf20_ans_vs_cpp": round(bd_ips / bm["decode_ips"], 2)
            if bm else None,
        }
    except Exception as e:  # noqa: BLE001 - extra row is best-effort
        big = {"zipf20_ans_error": f"{type(e).__name__}: {e}"[:300]}

    base = {}
    if os.path.exists(bp):
        base = json.load(open(bp))["methods"].get(METHOD, {})
    vs = dec_ips / base["decode_ips"] if base else 1.0

    print(json.dumps({
        "metric": f"{METHOD} decode ints/sec, device-resident lane "
                  f"engine, honest frame (zipf-1.25 n=2^{N.bit_length() - 1}, "
                  f"{jax.default_backend()}, pallas pivot-search)",
        "value": round(dec_ips),
        "unit": "ints/sec",
        "vs_baseline": round(vs, 4),
        "bits_per_int": round(bpi, 4),
        "encode_ips": round(enc_ips) if enc_ips else None,
        "encode_vs_baseline": round(enc_ips / base["encode_ips"], 4)
        if (enc_ips and base) else None,
        "e2e_encode_ips": round(N / e2e_enc),
        "e2e_decode_ips": round(N / e2e_dec),
        "baseline_decode_ips": base.get("decode_ips"),
        "baseline_encode_ips": base.get("encode_ips"),
        "baseline_bpi": base.get("bpi"),
        **big,
    }))


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except Exception as e:  # mid-run backend loss, OOM, etc.
        import traceback
        _fail(type(e).__name__,
              "".join(traceback.format_exception_only(type(e), e)).strip())
