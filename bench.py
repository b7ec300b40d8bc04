"""Headline benchmark: ANSfold-2 lane-engine decode throughput on TPU.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "ints/sec", "vs_baseline": N, ...}

Baseline = the unmodified reference C++ ans_fold<2> decoder measured
single-core on this machine (BASELINE_MEASURED.json, produced by
tools/ref_harness.cpp) on the same dataset: zipf(1.25), n = 2^25,
seed 42.

The headline value is the device-resident decode throughput via
models.engine.PreparedDecoder (pivot-search Pallas kernel, frames
UNCAPPED = the reference's exact adjust_freqs model): compressed stream
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
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = 1 << 25
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
    from ans_tpu import runtime
    runtime.enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from ans_tpu.models import framing
    from ans_tpu.models.ans import AnsFold
    from ans_tpu.models.engine import PreparedDecoder, PreparedEncoder
    from ans_tpu.ops import lane_codec, mappings_jax as mj, tables
    from ans_tpu.reference_model import mappings as map_np
    from ans_tpu.reference_model.model import adjust_freqs, load_prelude

    data = make_data()
    codec = AnsFold(2, lanes=LANES, max_frame=None)
    blob = codec.encode(data)                  # warmup + compile
    out = codec.decode(blob, N)
    assert (out == data).all(), "round-trip failed"
    bpi = 8.0 * len(blob) / N

    # decode: stage once, run the pivot-search kernel
    nfreqs, plen = load_prelude(blob)
    syms = np.arange(len(nfreqs), dtype=np.uint32)
    high, nb = map_np.fold_unmap_high(syms, 2)
    dt = tables.build_dec_table(nfreqs, high, nb)
    S, states, payload, t_sec, sec_len = framing.parse(blob, plen)
    T = lane_codec.lane_steps(N, S)
    prep = PreparedDecoder(payload, states, dt, N, S=S, T=T,
                           has_exc=True, t_sec=t_sec, sec_len=sec_len,
                           TC=TC)
    prep().block_until_ready()
    dec_ips = N / _time(lambda: prep().block_until_ready())

    # encode: device-resident scan + placement
    from ans_tpu.constants import fold_max_sigma
    mapped, k, b, hist = mj.fold_map_hist(jnp.asarray(data), fidelity=2,
                                          length=fold_max_sigma(2))
    freqs = np.asarray(hist).astype(np.uint64)
    nfreqs_e = adjust_freqs(freqs, int(np.flatnonzero(freqs)[-1]), True,
                            1, None)
    et = tables.build_enc_table(nfreqs_e)
    pad = T * S - N
    enc_ips = None
    try:
        pe = PreparedEncoder(jnp.pad(mapped, (0, pad)).reshape(T, S),
                             jnp.pad(k, (0, pad)).reshape(T, S),
                             jnp.pad(b, ((0, pad), (0, 0))).reshape(T, S, 3),
                             N, et, S=S, T=T)
        jax.block_until_ready(pe())
        enc_ips = N / _time(lambda: jax.block_until_ready(pe()))
    except ValueError:
        pass

    # end-to-end (includes host<->device transfers through the tunnel)
    e2e_enc = _time(lambda: codec.encode(data), 2)
    e2e_dec = _time(lambda: codec.decode(blob, N), 2)

    base = {}
    bp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "BASELINE_MEASURED.json")
    if os.path.exists(bp):
        base = json.load(open(bp))["methods"].get(METHOD, {})
    vs = dec_ips / base["decode_ips"] if base else 1.0

    print(json.dumps({
        "metric": f"{METHOD} decode ints/sec, device-resident lane "
                  f"engine, uncapped frame (zipf-1.25 n=2^25, "
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
    }))


if __name__ == "__main__":
    main()
