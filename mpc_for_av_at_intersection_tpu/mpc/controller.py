"""The tracking-MPC controller as a pure function over explicit state.

Functional twin of reference ``main/lib/mpc.py:242-326`` (class ``MPC``):
per tick — localize on the course, extract the velocity-lookahead
reference, roll the nonlinear plant along the previous plan for the
linearization operating point, condense, solve the box-QP, return the first
control. All mutable members of the reference class (previous plan, course
localization index, last steer) live in an explicit ``ControllerState``
pytree so the whole thing jits, scans, and vmaps.

Failure semantics (reference mpc.py:294-297): if the solve is unusable, the
controller commands maximum braking, keeps the previous steering angle, and
drops the warm start.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.dynamics import SimLimits, plant_rollout
from .condense import condense
from .config import MPCConfig
from .linearize import linearize_bicycle
from .qp import QPSolution, solve_box_qp
from .reference import compute_reference


class ControllerState(NamedTuple):
    oa: jnp.ndarray          # (T,) previous planned accelerations
    od: jnp.ndarray          # (T,) previous planned steers
    have_prev: jnp.ndarray   # () bool
    ov: jnp.ndarray          # (T+1,) previous planned speeds
    have_ov: jnp.ndarray     # () bool
    target_idx: jnp.ndarray  # () int32 course localization index
    last_steer: jnp.ndarray  # () last commanded steer (kept on failure)


class MPCStepOut(NamedTuple):
    accel: jnp.ndarray       # () commanded acceleration
    steer: jnp.ndarray       # () commanded steering angle
    state: ControllerState
    solved: jnp.ndarray      # () bool
    plan_xy: jnp.ndarray     # (T+1, 2) planned positions (diagnostics)
    xref: jnp.ndarray        # (4, T+1)
    target_idx: jnp.ndarray  # () int32


def init_controller_state(cfg: MPCConfig, dtype=jnp.float32) -> ControllerState:
    T = cfg.T
    return ControllerState(
        oa=jnp.zeros((T,), dtype),
        od=jnp.zeros((T,), dtype),
        have_prev=jnp.asarray(False),
        ov=jnp.zeros((T + 1,), dtype),
        have_ov=jnp.asarray(False),
        target_idx=jnp.asarray(0, jnp.int32),
        last_steer=jnp.asarray(0.0, dtype),
    )


def mpc_step(
    state4,            # (4,) x, y, v, yaw
    course,            # (N, 3) padded course (post-cutoff)
    course_speed,      # (N,) speed channel (speed-ref variant; zeros else)
    valid_len,         # () int32 current (possibly cut) course length
    dl,                # () course tick
    cs: ControllerState,
    cfg: MPCConfig,
    wheelbase: float,
) -> MPCStepOut:
    if cfg.jerk:
        from .jerk import mpc_step_jerk

        return mpc_step_jerk(
            state4, course, course_speed, valid_len, dl, cs, cfg, wheelbase
        )
    T = cfg.T
    dtype = course.dtype
    limits = SimLimits(
        max_steer=cfg.max_steer, max_speed=cfg.max_speed, min_speed=cfg.min_speed
    )

    oa = jnp.where(cs.have_prev, cs.oa, jnp.zeros_like(cs.oa))
    od = jnp.where(cs.have_prev, cs.od, jnp.zeros_like(cs.od))
    ov = cs.ov
    have_ov = cs.have_ov
    target_idx = cs.target_idx

    sol = None
    Ff = gf = None
    xref = None
    # re-linearization loop (reference `_iterative_linear_mpc_control`,
    # MAX_ITER is 1 in every shipped config; static Python loop)
    for _ in range(max(cfg.max_iter, 1)):
        ref = compute_reference(
            state4, course, course_speed, valid_len, dl, target_idx,
            ov, have_ov, T, cfg.dt, use_speed_channel=cfg.speed_ref,
        )
        xref, target_idx, reaches_end = ref

        controls = jnp.stack([oa, od], axis=-1)              # (T, 2)
        xbar = plant_rollout(state4, controls, cfg.dt, wheelbase, limits)
        dref = jnp.zeros((T,), dtype)
        A, B, C = linearize_bicycle(xbar[:-1, 2], xbar[:-1, 3], dref, cfg.dt, wheelbase)

        cqp = condense(A, B, C, state4, xref, reaches_end, cfg)
        sol = solve_box_qp(
            cqp.P, cqp.q, cqp.G, cqp.lo, cqp.hi,
            rounds=cfg.admm_rounds, iters=cfg.admm_iters,
            rho0=cfg.admm_rho, sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
            polish=cfg.polish,
        )
        u = sol.x.reshape(T, 2)
        oa, od = u[:, 0], u[:, 1]
        Ff, gf = cqp.F, cqp.g
        X = (Ff @ sol.x + gf).reshape(T, 4)
        ov = jnp.concatenate([state4[2:3], X[:, 2]])
        have_ov = jnp.asarray(True)

    solved = (
        jnp.all(jnp.isfinite(sol.x))
        & jnp.isfinite(sol.prim_res)
        & (sol.prim_res < 1e-2)
    )

    accel = jnp.where(solved, oa[0], jnp.asarray(cfg.max_decel, dtype))
    steer = jnp.where(solved, od[0], cs.last_steer)

    new_cs = ControllerState(
        oa=jnp.where(solved, oa, jnp.zeros_like(oa)),
        od=jnp.where(solved, od, jnp.zeros_like(od)),
        have_prev=solved,
        ov=jnp.where(solved, ov, jnp.zeros_like(ov)),
        have_ov=solved,
        target_idx=target_idx,
        last_steer=steer,
    )

    X = (Ff @ sol.x + gf).reshape(T, 4)
    plan_xy = jnp.concatenate([state4[None, :2], X[:, :2]])

    return MPCStepOut(accel, steer, new_cs, solved, plan_xy, xref, target_idx)


def xref_deviation(state4, course, target_idx):
    """Perpendicular-ish deviation metric, replicating the reference's
    element-wise formula exactly (mpc.py:301-308 — note it multiplies the
    component-wise difference by cos/sin separately rather than projecting)."""
    ref = course[target_idx]
    diff = ref[:2] - state4[:2]
    perp = ref[2] + jnp.pi / 2.0
    v = jnp.stack([jnp.cos(perp) * diff[0], jnp.sin(perp) * diff[1]])
    return jnp.linalg.norm(v)


def is_goal(state4, goal_xy, target_idx, valid_len, cfg: MPCConfig):
    """Goal test (reference mpc.py:310-326): close to the ORIGINAL course
    end, localized near the end of the CURRENT (possibly cut) course, and
    stopped."""
    d = jnp.hypot(state4[0] - goal_xy[0], state4[1] - goal_xy[1])
    near = d <= cfg.goal_dist
    at_end = jnp.abs(target_idx - valid_len) < 5
    stopped = jnp.abs(state4[2]) <= cfg.stop_speed
    return near & at_end & stopped
