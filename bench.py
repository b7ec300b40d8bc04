"""Headline benchmark: ANSfold-2 lane-engine decode throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ints/sec", "vs_baseline": N, ...}

Baseline = the unmodified reference C++ ans_fold<2> decoder measured
single-core on this machine (BASELINE_MEASURED.json, produced by
tools/ref_harness.cpp) on the same dataset: zipf(1.25), n = 2^23, seed 42.

Timing mirrors the reference's discipline (src/table_efficiency.cpp:64-121):
full encode()/decode() calls including model build and host<->device
transfers, min of NUM_RUNS after a warmup/compile run.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 1 << 23
SEED = 42
NUM_RUNS = 3
METHOD = "ANSfold-2"


def make_data():
    rng = np.random.default_rng(SEED)
    return (rng.zipf(1.25, size=N) - 1).clip(0, (1 << 28) - 1).astype(
        np.uint32)


def main():
    from ans_tpu import models, runtime
    runtime.enable_compilation_cache()
    import jax

    data = make_data()
    codec = models.get(METHOD, "lane")

    blob = codec.encode(data)  # warmup + compile
    out = codec.decode(blob, N)
    assert (out == data).all(), "round-trip failed"

    enc_t = min(_time(lambda: codec.encode(data)) for _ in range(NUM_RUNS))
    dec_t = min(_time(lambda: codec.decode(blob, N)) for _ in range(NUM_RUNS))

    bpi = 8.0 * len(blob) / N
    enc_ips = N / enc_t
    dec_ips = N / dec_t

    base = {}
    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        base = json.load(open(bp))["methods"].get(METHOD, {})
    vs = dec_ips / base["decode_ips"] if base else 1.0

    print(json.dumps({
        "metric": f"{METHOD} decode ints/sec (lane engine, "
                  f"zipf-1.25 n=2^23, {jax.default_backend()})",
        "value": round(dec_ips),
        "unit": "ints/sec",
        "vs_baseline": round(vs, 4),
        "encode_ips": round(enc_ips),
        "bits_per_int": round(bpi, 4),
        "baseline_decode_ips": base.get("decode_ips"),
        "baseline_bpi": base.get("bpi"),
    }))


def _time(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
