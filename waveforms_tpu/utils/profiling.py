"""Profiling hooks: wrap synthesis in a jax.profiler trace.

The reference has no tracing/profiling at all (SURVEY.md section 5); here a
one-liner captures a TensorBoard-compatible device trace of any synthesis
call.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str):
    """Context manager: profile everything inside to *log_dir*.

    >>> with trace('/tmp/wf-trace'):            # doctest: +SKIP
    ...     out = synthesize(channels, 0, 1e-3, 2e9)
    ...     out.block_until_ready()
    """
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in the profiler timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
