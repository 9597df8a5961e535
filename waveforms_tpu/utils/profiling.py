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


def device_event_times(log_dir: str, name_prefix: str) -> list[float]:
    """Durations (seconds) of device-side events matching *name_prefix*.

    Parses the chrome-trace JSON a :func:`trace` capture writes and keeps
    only events on a TPU device timeline (pid tagged ``/device:TPU``) --
    host-side dispatch spans are excluded.  This is the only trustworthy
    timing source on tunneled/virtualized device runtimes, where
    ``block_until_ready`` can return before execution completes.
    """
    import glob
    import gzip
    import json

    out: list[float] = []
    for path in glob.glob(log_dir + '/plugins/profile/*/*.trace.json.gz'):
        with gzip.open(path) as f:
            tr = json.load(f)
        events = tr.get('traceEvents', [])
        dev_pids = {e['pid'] for e in events
                    if e.get('ph') == 'M' and e.get('name') == 'process_name'
                    and 'TPU' in str(e.get('args', {}).get('name', ''))}
        out.extend(e['dur'] / 1e6 for e in events
                   if e.get('ph') == 'X' and e.get('pid') in dev_pids
                   and e.get('name', '').startswith(name_prefix))
    return out


def measure_device(fn, name_prefix: str, reps: int = 3,
                   log_dir: str = '/tmp/wftpu_measure') -> float:
    """Median device-side duration (seconds) of ``fn()`` over *reps* calls.

    ``fn`` must return a jax array (or pytree); the matching device events
    are located by *name_prefix* (e.g. ``'jit__run_kernel'``).  Raises
    ``RuntimeError`` if the trace contains no matching device events.
    """
    import shutil
    import statistics

    import jax

    shutil.rmtree(log_dir, ignore_errors=True)
    # a watchdog/abort inside a previous trace can leak a started profiler
    # session; clear it or every later measurement fails with
    # "Profile has already been started"
    try:
        jax.profiler.stop_trace()
    except Exception:
        pass
    with trace(log_dir):
        for _ in range(reps):
            jax.block_until_ready(fn())
    times = device_event_times(log_dir, name_prefix)
    if not times:
        raise RuntimeError(
            f"no device events matching '{name_prefix}' in {log_dir}")
    return statistics.median(times)
