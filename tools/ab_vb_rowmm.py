"""Same-process A/B of the vbyte decode kernel's terminator-prefix row
pass: log2(BD) roll rounds vs the hoisted tri-mask MXU matmul
(ANS_TPU_VB_ROWMM).  Machine variance between processes is 5-12%, so
both variants are staged and timed alternately in ONE process.

    python tools/ab_vb_rowmm.py [-n 25]
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
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke test (not a measurement)")
    args = ap.parse_args()

    from ans_tpu import runtime
    runtime.enable_compilation_cache()
    import jax.numpy as jnp
    from ans_tpu.ops import bytesplit as bs
    from ans_tpu.ops import pallas_bytesplit as pb

    n = 1 << args.n
    rng = np.random.default_rng(42)
    # the reference's vbyte benchmark shape: zipf-ish mixed lengths
    data = (rng.zipf(1.25, size=n) - 1).clip(0, (1 << 28) - 1).astype(
        np.uint32)
    ref, total = bs.vbyte_encode(jnp.asarray(data))
    payload = np.asarray(ref[: int(total)])

    staged = {}
    for name, env in (("roll", ""), ("rowmm", "1")):
        os.environ["ANS_TPU_VB_ROWMM"] = env
        a, kw = pb.vbyte_stage(payload, n, interpret=args.interpret)
        out = pb._vb_dec_call(*a, **kw)
        out.block_until_ready()
        assert (np.asarray(out).reshape(-1)[:n] == data).all(), name
        staged[name] = (a, kw)
    os.environ.pop("ANS_TPU_VB_ROWMM", None)

    best = {k: 1e30 for k in staged}
    for _ in range(args.runs):
        for k, (a, kw) in staged.items():   # alternate to cancel drift
            best[k] = min(best[k],
                          _t(lambda: pb._vb_dec_call(*a, **kw)
                             .block_until_ready()))
    for k, t in best.items():
        print(f"{k}: {n / t / 1e6:.0f}M ints/s  ({t * 1e3:.1f} ms)",
              flush=True)
    print(f"rowmm/roll speedup: {best['roll'] / best['rowmm']:.3f}x",
          flush=True)


if __name__ == "__main__":
    main()
