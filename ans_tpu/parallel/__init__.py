"""Multi-chip runtime: block data parallelism over a jax.sharding.Mesh.

The reference is single-threaded; its two concurrency seeds — 4-way
interleaved ANS states (ans_int.hpp:225-241) and independent per-block
models (src/pseudo_adaptive.cpp:77-130) — scale here to S lanes per chip
x D chips per mesh (SURVEY.md section 2.6).
"""

from .block_runtime import (BlockCodec, decode_blocked, encode_blocked,
                            make_mesh)  # noqa: F401
