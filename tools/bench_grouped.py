"""Large-alphabet benchmark: the grouped engine vs the C++ reference.

Measures ANS (ans_int) and ANSmsb on the paper's large-alphabet dataset
shapes (zipf20 sigma~1M, uniform16 sigma=65536, uniform20 sigma=2^20,
words49k = zipf over a 49152-word vocabulary), device-resident
(PreparedDecoder / PreparedEncoder), against the measured C++ rows in
BASELINE_MEASURED.json "large_alphabet" (tools/ref_harness.cpp, same
n and seed).  Appends a section to BENCH_DETAIL.md with --write.

    python tools/bench_grouped.py [-n 25] [--lanes 4096] [--write]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def datasets(n):
    from ans_tpu.utils import zipf as zm
    out = {}
    rng = np.random.default_rng(0)
    out["zipf20"] = zm.zipf(rng, n, 1 << 20)
    rng = np.random.default_rng(0)
    out["uniform16"] = rng.integers(0, 1 << 16, size=n, dtype=np.uint32)
    rng = np.random.default_rng(0)
    out["uniform20"] = rng.integers(0, 1 << 20, size=n, dtype=np.uint32)
    rng = np.random.default_rng(0)
    out["words49k"] = zm.zipf(rng, n, 49152)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=25, help="log2 n")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--write", action="store_true",
                    help="append the section to BENCH_DETAIL.md")
    ap.add_argument("--methods", default="ANS,ANSmsb")
    ap.add_argument("--datasets", default=None,
                    help="comma list (default: all four)")
    args = ap.parse_args()

    from ans_tpu import models, runtime
    runtime.enable_compilation_cache()
    import jax

    from ans_tpu.reference_model.model import load_prelude

    n = 1 << args.n
    data = datasets(n)
    if args.datasets:
        keep = args.datasets.split(",")
        data = {k: v for k, v in data.items() if k in keep}

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = json.load(open(os.path.join(root, "BASELINE_MEASURED.json")))
    base_rows = base.get("large_alphabet", {}).get("datasets", {})

    rows = []
    for dname, values in data.items():
        for method in args.methods.split(","):
            codec = models.get(method, "lane")
            codec.lanes = args.lanes
            t0 = time.time()
            blob = codec.encode(values)
            enc1 = time.time() - t0
            out = codec.decode(blob, n)
            ok = bool((out == values).all())
            bpi = 8 * len(blob) / n

            # --- device-resident decode -------------------------------
            prep = models.prepare_decoder(method, blob, n)
            prep().block_until_ready()
            best = min(_t(lambda: prep().block_until_ready())
                       for _ in range(args.runs))
            dec_ips = n / best

            # live symbol count from the wire prelude; rfold blobs open
            # with the reorder header, so parse via the codec there
            if method.startswith("ANSrfold"):
                dt, _off = codec._dec_table(blob)
                sigma = int(np.count_nonzero(dt.nfreqs))
            else:
                nfq, _ = load_prelude(blob)
                sigma = int(np.count_nonzero(nfq))

            # --- device-resident encode -------------------------------
            enc_ips = None
            try:
                pe = models.prepare_encoder(method, values,
                                            lanes=args.lanes)
                jax.block_until_ready(pe())
                beste = min(_t(lambda: jax.block_until_ready(pe()))
                            for _ in range(args.runs))
                enc_ips = n / beste
            except ValueError as e:
                print(f"  encode prepared skipped: {e}", flush=True)

            ds_rows = base_rows.get(dname, {})
            bm = ds_rows.get(method,
                             ds_rows.get("ANSmsb" if method == "ANSmsb"
                                         else "ANS", {}))
            row = dict(
                method=method, dataset=dname, ok=ok,
                sigma=sigma,
                engine=prep.engine, bpi=round(bpi, 4),
                cpp_bpi=bm.get("bpi"),
                dev_decode_mips=round(dec_ips / 1e6, 1),
                cpp_decode_mips=round(bm["decode_ips"] / 1e6, 1)
                if bm else None,
                dec_ratio=round(dec_ips / bm["decode_ips"], 2)
                if bm else None,
                dev_encode_mips=round(enc_ips / 1e6, 1)
                if enc_ips else None,
                cpp_encode_mips=round(bm["encode_ips"] / 1e6, 1)
                if bm else None,
                enc_ratio=round(enc_ips / bm["encode_ips"], 2)
                if (bm and enc_ips) else None,
                first_encode_s=round(enc1, 1))
            print(row, flush=True)
            rows.append(row)

    if args.write:
        body = ["## Large alphabets (tail-escape / grouped engines)\n",
                f"n = 2^{args.n}, S = {args.lanes}, seed-0 datasets "
                f"matching the C++ rows in BASELINE_MEASURED.json "
                f"large_alphabet (tools/ref_harness.cpp); min of "
                f"{args.runs}.  Generated by tools/bench_grouped.py."
                f"  engine `search` on an ANS row means the tail-escape "
                f"recoding engaged (ops/escape.py: <= 0.15% exactly-"
                f"accounted size trade, see the bpi columns); `grouped` "
                f"means the frequency-grouped layout with anchored "
                f"value planes.  The small-K escape cuts (K_GRID down "
                f"to 2^10) keep every folded alphabet near ~2^10 "
                f"symbols, so all four ANS rows ride the shallow "
                f"pivot search.\n",
                "| method | dataset | sigma | engine | bpi | C++ bpi "
                "| dec M/s | C++ dec | ratio | enc M/s | C++ enc | "
                "ratio | ok |",
                "|---|---|---|---|---|---|---|---|---|---|---|---|---|"]
        for r in rows:
            body.append(f"| {r['method']} | {r['dataset']} | "
                        f"{r['sigma']} | {r['engine']} | {r['bpi']} | "
                        f"{r['cpp_bpi']} | {r['dev_decode_mips']} | "
                        f"{r['cpp_decode_mips']} | **{r['dec_ratio']}x**"
                        f" | {r['dev_encode_mips']} | "
                        f"{r['cpp_encode_mips']} | **{r['enc_ratio']}x**"
                        f" | {r['ok']} |")
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import _bench_doc
        _bench_doc.replace_section("large_alphabet", "\n".join(body))
        print("replaced section large_alphabet in BENCH_DETAIL.md")


if __name__ == "__main__":
    main()
