"""Multi-config benchmark over the BASELINE.json north-star configs.

Measures, per method/dataset: bits/int, device-resident decode ints/s
(PreparedDecoder), e2e encode/decode, against the C++ reference engine
measured on this host (tools/ref_harness).  Writes BENCH_DETAIL.md.

    python tools/full_bench.py [-n 23]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def docid_gaps(rng, n):
    """Clustered docid d-gaps (small ints, interp_test-style)."""
    gaps = rng.geometric(0.3, size=n).astype(np.uint32)
    jumps = rng.random(n) < 0.001
    gaps[jumps] += rng.integers(100, 5000, size=int(jumps.sum()),
                                dtype=np.uint32).astype(np.uint32)
    return gaps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=23, help="log2 n")
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    from ans_tpu import models, runtime
    runtime.enable_compilation_cache()
    import jax

    from ans_tpu.models import framing
    from ans_tpu.models.engine import PreparedDecoder
    from ans_tpu.ops import lane_codec, tables
    from ans_tpu.reference_model import mappings as map_np
    from ans_tpu.reference_model.model import load_prelude

    n = 1 << args.n
    rng = np.random.default_rng(42)
    zipf = (rng.zipf(1.25, size=n) - 1).clip(0, (1 << 28) - 1).astype(
        np.uint32)
    docids = docid_gaps(np.random.default_rng(7), n)

    configs = [
        ("ANSmsb", "zipf", zipf),
        ("ANSfold-2", "zipf", zipf),
        ("ANSfold-3", "zipf", zipf),
        ("ANSrfold-1", "zipf", zipf),
        ("ANS", "docid-gaps", docids),
        ("ANSmsb", "docid-gaps", docids),
    ]
    rows = []
    for method, dname, data in configs:
        codec = models.get(method, "lane")
        t0 = time.time()
        blob = codec.encode(data)
        enc1 = time.time() - t0
        out = codec.decode(blob, n)
        ok = bool((out == data).all())
        bpi = 8 * len(blob) / n
        prep = _prepare(method, blob, n, framing, PreparedDecoder,
                        lane_codec, tables, map_np, load_prelude)
        prep().block_until_ready()
        best = min(_t(lambda: prep().block_until_ready())
                   for _ in range(args.runs))
        dec_ips = n / best
        row = dict(method=method, dataset=dname, ok=ok,
                   bpi=round(bpi, 4), dev_decode_mips=round(dec_ips / 1e6),
                   first_encode_s=round(enc1, 1))
        print(row, flush=True)
        rows.append(row)

    with open("BENCH_DETAIL.md", "w") as f:
        f.write("# Multi-config benchmark (TPU v5e, device-resident "
                f"decode, n=2^{args.n} seed 42)\n\n")
        f.write("C++ reference single-core on this host: fold2 dec "
                "217.7M / msb dec 203.1M / int dec 2.5M ints/s "
                "(BASELINE_MEASURED.json).\n\n")
        f.write("| method | dataset | bits/int | decode Mints/s | "
                "roundtrip |\n|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['method']} | {r['dataset']} | {r['bpi']} | "
                    f"{r['dev_decode_mips']} | {r['ok']} |\n")
    print("wrote BENCH_DETAIL.md")


def _prepare(method, blob, n, framing, PreparedDecoder, lane_codec,
             tables, map_np, load_prelude):
    from ans_tpu.constants import fold_threshold
    off = 0
    if method.startswith("ANSrfold"):
        f = int(method.split("-")[1])
        thres = fold_threshold(f)
        flag = int.from_bytes(blob[0:4], "little")
        off = 4 + (4 * thres if flag == 1 else 0)
    nfreqs, plen = load_prelude(blob[off:])
    syms = np.arange(len(nfreqs), dtype=np.uint32)
    if method == "ANS":
        dt = tables.build_dec_table(nfreqs)
        has_exc = False
    elif method.startswith("ANSmsb"):
        dt = tables.build_dec_table(nfreqs, map_np.msb_unmap_high(syms),
                                    map_np.msb_exception_bytes(syms))
        has_exc = True
    else:
        f = int(method.split("-")[1])
        high, nb = map_np.fold_unmap_high(syms, f)
        if method.startswith("ANSrfold"):
            thres = fold_threshold(f)
            flag = int.from_bytes(blob[0:4], "little")
            if flag == 1:
                mf = np.frombuffer(blob, dtype="<u4", count=thres,
                                   offset=4)
                high = np.where(syms < thres,
                                mf[np.minimum(syms, thres - 1)],
                                high - np.uint32(thres)).astype(np.uint32)
            else:
                high = np.where(syms < thres, syms, high).astype(np.uint32)
        dt = tables.build_dec_table(nfreqs, high, nb)
        has_exc = True
    S, states, payload, t_sec, sec_len = framing.parse(blob, off + plen)
    return PreparedDecoder(payload, states, dt, n, S=S,
                           T=lane_codec.lane_steps(n, S), has_exc=has_exc,
                           t_sec=t_sec, sec_len=sec_len)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
