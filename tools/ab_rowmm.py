"""Same-process A/B of the rank-prefix ROW pass: log-roll rounds vs the
hoisted-mask (B,B)@(B,128) MXU matmul (ANS_TPU_ROWMM).

The r2 ablation put the prefix chain at 26% of the decode step and the
in-loop-mask matmul variant measured 4% SLOWER; the hoisted build is
the untried half.  Machine variance between processes is 5-12%, so both
variants are prepared and timed alternately in ONE process.

    python tools/ab_rowmm.py [-n 25] [--lanes 4096] [--method ANSfold-2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", type=int, default=25)
    ap.add_argument("--runs", type=int, default=6)
    ap.add_argument("--lanes", type=int, default=4096)
    ap.add_argument("--method", default="ANSfold-2")
    args = ap.parse_args()

    from ans_tpu import models, runtime
    runtime.enable_compilation_cache()
    n = 1 << args.n
    rng = np.random.default_rng(42)
    data = (rng.zipf(1.25, size=n) - 1).clip(0, (1 << 28) - 1).astype(
        np.uint32)
    codec = models.get(args.method, "lane")
    codec.lanes = args.lanes
    blob = codec.encode(data)

    preps = {}
    for name, env in (("roll", ""), ("rowmm", "1")):
        os.environ["ANS_TPU_ROWMM"] = env
        p = models.prepare_decoder(args.method, blob, n)
        first = p()
        first.block_until_ready()
        assert (p.to_host(first) == data).all(), name
        preps[name] = p
    os.environ.pop("ANS_TPU_ROWMM", None)

    best = {k: 1e30 for k in preps}
    for _ in range(args.runs):
        for k, p in preps.items():   # alternate to cancel drift
            best[k] = min(best[k], _t(lambda: p().block_until_ready()))
    for k, t in best.items():
        print(f"{k}: {n / t / 1e6:.0f}M ints/s  ({t * 1e3:.1f} ms)",
              flush=True)
    print(f"rowmm/roll speedup: {best['roll'] / best['rowmm']:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
