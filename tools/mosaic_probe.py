"""Per-op cost probe for Mosaic/Pallas on this TPU (v5e via axon).

Times a serial dependency chain of a single vector op inside one
pallas kernel (fori_loop x unroll), isolating per-instruction cost from
grid/dispatch overhead.  Informs kernel op budgets (docs/PERF.md):
round-1 estimated "4-20ns/instruction" from whole-kernel fits; this
measures each primitive directly at the shapes the codec kernels use.

Run: python -u tools/mosaic_probe.py   (TPU; ~1 min incl. compiles)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from ans_tpu import runtime  # noqa: E402

runtime.enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

ITERS = 4000
UNROLL = 16


def _mk(op, R, needs_table=False, rows=8):
    def kernel(t_ref, x_ref, o_ref):
        t = t_ref[:]

        def body(i, v):
            for _ in range(UNROLL):
                v = op(v, t)
            return v

        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, x_ref[:])

    @jax.jit
    def run(t, x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        )(t, x)

    return run


def probe(name, op, R, rows=8):
    t = jnp.asarray(np.arange(rows * 128, dtype=np.int32).reshape(rows, 128))
    x = jnp.asarray(np.arange(R * 128, dtype=np.int32).reshape(R, 128) & 63)
    run = _mk(op, R)
    out = run(t, x)
    out.block_until_ready()
    best = 1e30
    for _ in range(3):
        t0 = time.perf_counter()
        run(t, x).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    ns = best * 1e9 / (ITERS * UNROLL)
    print(f"{name:42s} R={R:3d}: {ns:8.2f} ns/op", flush=True)
    return ns


def main():
    print("backend", jax.default_backend(), flush=True)
    for R in (8, 32):
        probe("add", lambda v, t: v + 1, R)
        probe("cmp+where", lambda v, t: jnp.where(v > 3, v, v + 1), R)
        probe("shift", lambda v, t: (v >> 1) | 1, R)
        probe("roll lane (axis=1)",
              lambda v, t: pltpu.roll(v, 5, axis=1) & 63, R)
        probe("roll sublane (axis=0)",
              lambda v, t: pltpu.roll(v, 1, axis=0) & 63, R)
        probe("take_along axis=1 (1 row bcast)",
              lambda v, t: jnp.take_along_axis(
                  jnp.broadcast_to(t[0:1, :], v.shape), v & 127,
                  axis=1) & 63, R)
        probe("mul", lambda v, t: (v * 3) & 63, R)
        probe("i32->f32->exp",
              lambda v, t: (jax.lax.shift_right_logical(
                  pltpu.bitcast((v + 2).astype(jnp.float32), jnp.int32),
                  23) - 127) & 63, R)

        def row_lookup(v, t):
            idx = v & 1023
            lo = idx & 127
            hi = idx >> 7
            terms = []
            for h in range(8):
                row = jnp.broadcast_to(t[h:h + 1, :], v.shape)
                y = jnp.take_along_axis(row, lo, axis=1)
                terms.append(jnp.where(hi == h, y, 0))
            while len(terms) > 1:
                terms = [a | b for a, b in zip(terms[::2], terms[1::2])] \
                    + ([terms[-1]] if len(terms) & 1 else [])
            return terms[0] & 63

        probe("8-row lookup (full)", row_lookup, R)
    print("done", flush=True)


if __name__ == "__main__":
    main()
