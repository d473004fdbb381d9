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


class _Annotation:
    """Named profiler scope usable as a context manager OR a decorator
    (``jax.profiler.TraceAnnotation`` alone is not callable, so the
    decorator form in this function's contract needs the wrapper)."""

    def __init__(self, name: str) -> None:
        self._name = name
        # Stack, not a single slot: one annotation object may be entered
        # reentrantly (nested `with ann:` blocks); a lone self._ctx would
        # be clobbered by the inner entry and __exit__ would then close
        # the wrong (already-closed) scope.  (Scopes are per-thread LIFO —
        # don't share one annotation object across threads.)
        self._stack: list = []

    def __enter__(self):
        import jax

        ctx = jax.profiler.TraceAnnotation(self._name)
        self._stack.append(ctx)
        return ctx.__enter__()

    def __exit__(self, *exc):
        return self._stack.pop().__exit__(*exc)

    def __call__(self, fn):
        import functools

        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            with _Annotation(self._name):
                return fn(*args, **kwargs)

        return wrapped


def annotate(name: str) -> _Annotation:
    """Named-scope annotation for profiler timelines (decorator or ctx)."""
    return _Annotation(name)
