"""Scripted moving agents ("other vehicles") as batched pure functions.

Capability parity with reference ``main/lib/moving_obstacles.py``: three
policy families — T-intersection through/turning traffic, roundabout
traffic, and straight arterial riders — each an open-loop steering schedule
keyed on the agent's own position, plus a start-delay ``offset``. The
reference gives each agent a private mutable ``Bicycle``; here agents are
rows of an ``AgentStates`` array stepped in lockstep with
``lax.switch``-selected policies, so a scenario's whole agent set advances
in one fused call (and batches across scenarios with vmap).

Reference quirks reproduced:
- the roundabout schedule *teleports the heading* (sets theta hard) on two
  of its zone transitions (moving_obstacles.py:80-81, :103-104);
- the steering-for-radius helper always uses wheelbase 2.86 regardless of
  the agent's geometry (moving_obstacles.py:16 default L);
- the start-delay gate is ``counter > offset/dt`` (strict).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

POLICY_T_INTERSECTION = 0
POLICY_ROUNDABOUT = 1
POLICY_ARTERIAL = 2

_L_STEER_HELPER = 2.86  # reference hard-codes this in the radius helper


def steering_for_radius(radius: float, wheelbase: float = _L_STEER_HELPER) -> float:
    return math.atan(wheelbase / radius)


class AgentParams(NamedTuple):
    """Static per-agent parameters; arrays of shape (n_agents,)."""

    policy: jnp.ndarray      # int32 policy id
    direction: jnp.ndarray   # +1 / -1
    turning: jnp.ndarray     # bool
    speed: jnp.ndarray       # commanded forward speed
    offset: jnp.ndarray      # start delay [s]; <= 0 means none
    x_turn: jnp.ndarray      # turn trigger abscissa (T-intersection)
    active: jnp.ndarray      # bool — padded slots are inactive


class AgentStates(NamedTuple):
    pose: jnp.ndarray        # (n_agents, 3) x, y, theta
    counter: jnp.ndarray     # (n_agents,) int32 ticks elapsed


_R5 = steering_for_radius(5.0)


def _t_intersection_steer(p: AgentParams, pose):
    x, th = pose[0], pose[2]
    pos_dir = p.direction >= 0
    steer_pos = jnp.where((x >= p.x_turn) & (th > -jnp.pi / 2), -0.38, 0.0)
    steer_neg = jnp.where((x <= p.x_turn) & (th < 3 * jnp.pi / 2), 0.19, 0.0)
    steer = jnp.where(pos_dir, steer_pos, steer_neg)
    steer = jnp.where(p.turning, steer, 0.0)
    return steer, pose


def _roundabout_steer(p: AgentParams, pose):
    x, y, th = pose[0], pose[1], pose[2]
    pos_dir = p.direction >= 0

    # direction == +1 (left to right); sequential zone overrides in the
    # reference's order (later rules win)
    s = jnp.zeros((), pose.dtype)
    s = jnp.where((-7.0 <= x) & (x <= -4.0) & (y < 0), -_R5, s)
    s = jnp.where(-3.0 < x, _R5, s)
    s = jnp.where((y > 0) & (-5.0 <= x) & (x <= -3.0), -_R5, s)
    tele_pos = (x <= -3.0) & (y > 0)
    s = jnp.where(tele_pos, 0.0, s)
    th_pos = jnp.where(tele_pos, -jnp.pi, th)

    s2 = jnp.zeros((), pose.dtype)
    s2 = jnp.where((4.0 <= x) & (x <= 7.0) & (y > 0), -_R5, s2)
    s2 = jnp.where(x < 3.0, _R5, s2)
    s2 = jnp.where((y < 0) & (3.0 <= x) & (x <= 5.0), -_R5, s2)
    tele_neg = (3.0 <= x) & (y < 0)
    s2 = jnp.where(tele_neg, 0.0, s2)
    th_neg = jnp.where(tele_neg, 0.0, th)

    steer = jnp.where(pos_dir, s, s2)
    new_th = jnp.where(pos_dir, th_pos, th_neg)
    steer = jnp.where(p.turning, steer, 0.0)
    new_th = jnp.where(p.turning, new_th, th)
    return steer, pose.at[2].set(new_th)


def _arterial_steer(p: AgentParams, pose):
    # zero steer, expressed via the input so every lax.switch branch has the
    # same varying-axis type under shard_map
    return pose[2] * 0.0, pose


def _control_one(p_row: AgentParams, pose, counter, dt):
    # module-level branch functions (not per-call lambdas): stable function
    # identities let JAX's tracing caches hit across the many engine jits
    # that trace this in one process
    steer, pose = jax.lax.switch(
        p_row.policy,
        (_t_intersection_steer, _roundabout_steer, _arterial_steer),
        p_row,
        pose,
    )
    delayed = (p_row.offset > 0) & (counter.astype(pose.dtype) * dt <= p_row.offset)
    v = jnp.where(delayed, 0.0, p_row.speed)
    return v, steer, pose


def agents_get(params: AgentParams, states: AgentStates, dt: float):
    """(n_agents, 6) rows (x, y, v, yaw, a, steer) — the reference ``get()``
    tuple (moving_obstacles.py:122-124). Quirk: that tuple is built left to
    right, so the yaw slot is read *before* the steering property applies
    any heading teleport — the returned yaw is the pre-teleport one, while
    the steer slot reflects the post-teleport schedule."""

    def one(p_row, pose, counter):
        v, steer, _ = _control_one(p_row, pose, counter, dt)
        return jnp.stack([pose[0], pose[1], v, pose[2], jnp.zeros((), pose.dtype), steer])

    return jax.vmap(one)(params, states.pose, states.counter)


def agents_step(
    params: AgentParams, states: AgentStates, dt: float, wheelbase: float
) -> AgentStates:
    """Advance every agent one tick (forward-Euler bicycle on its own pose)."""

    def one(p_row, pose, counter):
        v, steer, pose = _control_one(p_row, pose, counter, dt)
        x, y, th = pose[0], pose[1], pose[2]
        x = x + v * jnp.cos(th) * dt
        y = y + v * jnp.sin(th) * dt
        th = th + (v / wheelbase) * jnp.tan(steer) * dt
        new_pose = jnp.stack([x, y, th])
        new_pose = jnp.where(p_row.active, new_pose, pose)
        return new_pose, counter + 1

    pose, counter = jax.vmap(one)(params, states.pose, states.counter)
    return AgentStates(pose=pose, counter=counter)


# --- host-side constructors (return (params_row, state_row) as numpy dicts) ---

def _mk(policy, direction, turning, speed, offset, x_turn, pose):
    import numpy as np

    params = dict(
        policy=np.int32(policy),
        direction=np.float64(direction),
        turning=bool(turning),
        speed=np.float64(speed),
        offset=np.float64(offset if offset is not None else 0.0),
        x_turn=np.float64(x_turn),
        active=True,
    )
    state = dict(pose=np.asarray(pose, np.float64), counter=np.int32(0))
    return params, state


def make_t_intersection_agent(direction: int, turning: bool, speed: float, offset=None):
    """Reference MovingObstacleTIntersection.__init__ (moving_obstacles.py:165-195)."""
    if direction >= 0:
        pose, x_turn = (-30.0, -3.0, 0.0), -10.0
    else:
        pose, x_turn = (30.0, 3.0, math.pi), 12.0
    return _mk(POLICY_T_INTERSECTION, 1 if direction >= 0 else -1, turning, speed, offset, x_turn, pose)


def make_roundabout_agent(direction: int, turning: bool, speed: float, offset=None):
    """Reference MovingObstacleRoundabout.__init__ (moving_obstacles.py:28-60)."""
    if direction >= 0:
        pose, x_turn = (-30.0, -3.0, 0.0), -10.0
    else:
        pose, x_turn = (30.0, 3.0, math.pi), 12.0
    return _mk(POLICY_ROUNDABOUT, 1 if direction >= 0 else -1, turning, speed, offset, x_turn, pose)


def make_arterial_agent(x_init: float, y_init: float, speed: float, offset=None):
    """Reference MovingObstacleArterial.__init__ (moving_obstacles.py:126-142)."""
    return _mk(POLICY_ARTERIAL, 1, False, speed, offset, 0.0, (x_init, y_init, math.pi / 2))


def stack_agents(rows, n_slots: int, dtype=None):
    """Stack (params_row, state_row) pairs into padded AgentParams/AgentStates."""
    import numpy as np

    dtype = dtype or np.float64
    n = len(rows)
    if n > n_slots:
        raise ValueError(f"{n} agents > {n_slots} slots")

    def field(name, default, dt_):
        vals = [r[0][name] for r in rows] + [default] * (n_slots - n)
        return np.asarray(vals, dt_)

    params = AgentParams(
        policy=field("policy", 0, np.int32),
        direction=field("direction", 1.0, dtype),
        turning=field("turning", False, bool),
        speed=field("speed", 0.0, dtype),
        offset=field("offset", 0.0, dtype),
        x_turn=field("x_turn", 0.0, dtype),
        active=field("active", False, bool),
    )
    poses = [r[1]["pose"] for r in rows] + [np.zeros(3)] * (n_slots - n)
    states = AgentStates(
        pose=np.asarray(poses, dtype),
        counter=np.zeros(n_slots, np.int32),
    )
    return params, states
