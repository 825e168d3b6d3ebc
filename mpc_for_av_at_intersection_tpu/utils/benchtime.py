"""Honest wall-clock timing for remote-device (tunneled TPU) benchmarks.

``jax.block_until_ready`` can return before a computation actually finishes
when the device is reached through a remote tunnel and the executable is
already warm server-side (observed: a 230 ms/iter kernel "measured" at
0.1 ms/iter). The only trustworthy synchronization point is a real value
fetch. Helpers here time a *chain* of dependent dispatches terminated by a
scalar fetch, and subtract the separately measured fetch overhead, so per-
iteration numbers reflect device execution, not tunnel round-trips.
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

__all__ = ["fetch_scalar", "measure_fetch_cost", "time_chained"]


def fetch_scalar(x) -> float:
    """Force a device->host round-trip that waits for ``x``'s value."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def measure_fetch_cost(x, n: int = 5) -> float:
    """Seconds per scalar fetch of an already-computed array ``x``.

    The `+ i` keeps each probe a distinct tiny computation so no layer can
    replay a memoized answer.
    """
    import jax.numpy as jnp

    float(jnp.sum(x))  # warm the reduce kernel
    t0 = time.perf_counter()
    for i in range(n):
        float(jnp.sum(x) + i)
    return (time.perf_counter() - t0) / n


def time_chained(step: Callable, carry, n_iters: int) -> Tuple[float, object]:
    """Time ``n_iters`` dependent invocations of ``step(carry) -> carry``.

    The data dependency chains the dispatches; the terminal scalar fetch
    waits for the whole chain. Returns (seconds_per_iter, final_carry).
    """
    import jax

    leaf = jax.tree.leaves(carry)[0]
    fetch_cost = measure_fetch_cost(leaf)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        carry = step(carry)
    fetch_scalar(jax.tree.leaves(carry)[0])
    dt = (time.perf_counter() - t0 - fetch_cost) / n_iters
    return dt, carry
