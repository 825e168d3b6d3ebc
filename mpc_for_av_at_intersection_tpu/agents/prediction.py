"""Constant-control forward prediction of other agents.

Parity with reference ``main/lib/moving_obstacles_prediction.py:21-47``:
Euler rollout under constant (a, steer), with the reference's quirk that the
heading update uses the *already-updated* velocity (:26-27). The returned
trajectory excludes the initial state (the reference records the pose
*after* each step), length n_steps = len(arange(0, horizon, dt)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def predict_constant_control(obs6, dt: float, wheelbase: float, n_steps: int):
    """obs6: (..., 6) rows (x, y, v, yaw, a, steer) — the agents_get tuple.

    Returns (..., n_steps, 3) predicted (x, y, yaw).
    """

    def one(row):
        x, y, v, yaw, a, steer = (row[i] for i in range(6))

        def step(carry, _):
            x, y, v, yaw = carry
            x = x + v * jnp.cos(yaw) * dt
            y = y + v * jnp.sin(yaw) * dt
            v = v + a * dt
            yaw = yaw + (v / wheelbase) * jnp.tan(steer) * dt
            return (x, y, v, yaw), jnp.stack([x, y, yaw])

        _, traj = jax.lax.scan(step, (x, y, v, yaw), None, length=n_steps)
        return traj

    batch_shape = obs6.shape[:-1]
    flat = obs6.reshape((-1, 6))
    out = jax.vmap(one)(flat)
    return out.reshape(batch_shape + (n_steps, 3))
