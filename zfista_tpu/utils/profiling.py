"""Profiling hooks (SURVEY.md §5: the reference has only a verbose table
and notebook %line_profiler; the TPU-native equivalents are the XLA
profiler trace and named step annotations).

Usage::

    from zfista_tpu.utils.profiling import trace
    with trace("/tmp/profile"):          # view in TensorBoard / xprof
        prob.solve_batch(x0s)
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace of the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named-scope annotation for profiler timelines (decorator or ctx)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
