"""Device tracing hooks (the reference's profiling is min-of-N wall
clocks + RECORD_STATS, SURVEY.md section 5; on TPU the equivalent is a
jax.profiler trace around the region of interest)."""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(logdir: str = "/tmp/ans_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation context for labelling kernel regions."""
    import jax
    return jax.profiler.TraceAnnotation(name)
