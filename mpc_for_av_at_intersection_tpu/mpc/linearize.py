"""Batched linearization of the kinematic bicycle about an operating point.

Closed-form A, B, C of reference ``main/lib/mpc.py:58-79`` (and the
5-state extension of ``mpc_jerk.py:61-86``), vectorized over the horizon:
given operating velocities/headings/steers for t = 0..T-1, emit
(T, nx, nx), (T, nx, nu), (T, nx) in one shot — no per-t Python loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def linearize_bicycle(vbar, phibar, deltabar, dt, wheelbase, nx: int = 4):
    """vbar, phibar, deltabar: (T,) operating point arrays.

    Returns A (T, nx, nx), B (T, nx, 2), C (T, nx) such that
    x_{t+1} = A_t x_t + B_t u_t + C_t for state (x, y, v, yaw[, a]).
    """
    T = vbar.shape[0]
    dtype = vbar.dtype
    cphi, sphi = jnp.cos(phibar), jnp.sin(phibar)
    tand = jnp.tan(deltabar)
    cd2 = jnp.cos(deltabar) ** 2

    A = jnp.zeros((T, nx, nx), dtype)
    A = A.at[:, jnp.arange(nx), jnp.arange(nx)].set(1.0)
    A = A.at[:, 0, 2].set(dt * cphi)
    A = A.at[:, 0, 3].set(-dt * vbar * sphi)
    A = A.at[:, 1, 2].set(dt * sphi)
    A = A.at[:, 1, 3].set(dt * vbar * cphi)
    A = A.at[:, 3, 2].set(dt * tand / wheelbase)

    B = jnp.zeros((T, nx, 2), dtype)
    B = B.at[:, 2, 0].set(dt)
    B = B.at[:, 3, 1].set(dt * vbar / (wheelbase * cd2))

    C = jnp.zeros((T, nx), dtype)
    C = C.at[:, 0].set(dt * vbar * sphi * phibar)
    C = C.at[:, 1].set(-dt * vbar * cphi * phibar)
    C = C.at[:, 3].set(-dt * vbar * deltabar / (wheelbase * cd2))

    if nx == 5:
        # jerk variant: a persists as a state, feeds v, and is driven by u_a
        # (reference mpc_jerk.py:66-78: A[4,4]=1, A[2,4]=dt, B[4,0]=dt)
        A = A.at[:, 2, 4].set(dt)
        B = B.at[:, 4, 0].set(dt)

    return A, B, C
