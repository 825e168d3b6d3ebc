"""Wall-clock tracing + device profiling helpers.

Capability parity with the reference's ``@measure_time`` decorator
(``main/lib/helpers.py``), extended with a context manager, aggregate
statistics, and an optional XLA device profile capture.
"""

from __future__ import annotations

import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict, List


_RECORDS: Dict[str, List[float]] = defaultdict(list)


def measure_time(fn=None, *, name=None):
    """Decorator recording wall time per call (also printed, like the
    reference helper)."""

    def wrap(f):
        label = name or f.__qualname__

        @functools.wraps(f)
        def inner(*a, **kw):
            t0 = time.perf_counter()
            out = f(*a, **kw)
            dt = time.perf_counter() - t0
            _RECORDS[label].append(dt)
            print(f"[timing] {label}: {dt * 1e3:.2f} ms")
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


@contextlib.contextmanager
def timed(label: str, verbose: bool = False):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    _RECORDS[label].append(dt)
    if verbose:
        print(f"[timing] {label}: {dt * 1e3:.2f} ms")


def timing_summary() -> Dict[str, Dict[str, float]]:
    import numpy as np

    return {
        k: {
            "n": len(v),
            "mean_ms": float(np.mean(v) * 1e3),
            "p50_ms": float(np.percentile(v, 50) * 1e3),
            "max_ms": float(np.max(v) * 1e3),
        }
        for k, v in _RECORDS.items()
    }


def reset_timing() -> None:
    _RECORDS.clear()


@contextlib.contextmanager
def device_profile(out_dir: str):
    """Capture an XLA device profile (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
