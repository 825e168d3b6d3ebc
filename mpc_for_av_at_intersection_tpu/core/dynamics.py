"""Kinematic bicycle dynamics + clamped simulator plant (pure functions).

Behavioral parity:
- ``bicycle_step``  : forward-Euler rear-axle kinematic bicycle, the exact
  update of reference ``main/bicycle/main.py:28-41``.
- ``plant_step``    : the closed-loop plant of reference
  ``main/lib/simulation.py:35-47`` — steering clamped, position integrated
  with the *pre-update* velocity, then velocity updated by acceleration and
  clamped (velocity-then-accel operator splitting; a documented reference
  quirk we reproduce).

State layout: (..., 4) = (x, y, v, yaw). Control: (..., 2) = (a, delta).
Pose layout: (..., 3) = (x, y, theta).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimLimits:
    """Actuation/plant limits (reference ``simulation.py:23-25``,
    ``config/mpc_config.json``)."""

    max_steer: float = math.radians(45.0)
    max_speed: float = 30.0 / 3.6
    min_speed: float = -5.0
    max_accel: float = 2.0
    max_decel: float = -10.0
    max_dsteer: float = math.radians(30.0)  # steering-rate limit [rad/s]


def bicycle_step(pose, v, delta, dt, wheelbase):
    """One Euler step of the kinematic bicycle. pose (...,3); v, delta scalars
    or broadcastable arrays."""
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    x = x + v * jnp.cos(th) * dt
    y = y + v * jnp.sin(th) * dt
    th = th + (v / wheelbase) * jnp.tan(delta) * dt
    return jnp.stack([x, y, th], axis=-1)


def bicycle_rollout(pose0, v, delta, dt, wheelbase, n_steps):
    """Constant-control rollout; returns (n_steps+1, ..., 3) including pose0."""

    def step(pose, _):
        nxt = bicycle_step(pose, v, delta, dt, wheelbase)
        return nxt, nxt

    _, traj = jax.lax.scan(step, pose0, None, length=n_steps)
    return jnp.concatenate([pose0[None], traj], axis=0)


def plant_step(state, control, dt, wheelbase, limits: SimLimits):
    """Clamped plant update. state (...,4) = (x,y,v,yaw); control (...,2)."""
    a, delta = control[..., 0], control[..., 1]
    delta = jnp.clip(delta, -limits.max_steer, limits.max_steer)
    x, y, v, yaw = state[..., 0], state[..., 1], state[..., 2], state[..., 3]
    # position/heading integrate with the pre-update velocity
    x = x + v * jnp.cos(yaw) * dt
    y = y + v * jnp.sin(yaw) * dt
    yaw = yaw + (v / wheelbase) * jnp.tan(delta) * dt
    v = jnp.clip(v + a * dt, limits.min_speed, limits.max_speed)
    return jnp.stack([x, y, v, yaw], axis=-1)


def plant_rollout(state0, controls, dt, wheelbase, limits: SimLimits):
    """Roll the plant through a (T, ..., 2) control sequence.

    Returns (T+1, ..., 4) states including state0. This is the nonlinear
    operating-point rollout used by the MPC linearization (reference
    ``mpc.py:112-126``).
    """

    def step(state, u):
        nxt = plant_step(state, u, dt, wheelbase, limits)
        return nxt, nxt

    _, traj = jax.lax.scan(step, state0, controls)
    return jnp.concatenate([state0[None], traj], axis=0)
