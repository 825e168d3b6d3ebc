"""Jerk-penalized (comfort) MPC variant — 5-state condensing.

Parity target: reference ``main/lib/mpc_jerk.py``. The model adds an
acceleration *state* (x4): v_{t+1} = v_t + dt*(x4_t + u0_t), x4_{t+1} =
x4_t + dt*u0_t (linearize.py nx=5), with a jerk penalty on state
differences (x4_{t+1} - x4_t)^2 and the initial accel state FREE (the
reference pins only x[:4,0], mpc_jerk.py:193).

Condensing therefore uses an extended decision vector z = [u_flat; a0]
(2T+1 vars): the free initial accel becomes one extra column of the
prediction operator.

Documented divergence: the reference's terminal cost uses a 4x4 Qf against
the 5-dim state (``Qf = np.diag([1,1,0,.5]) * T`` with NX=5), which crashes
CVXPY whenever `reaches_end` fires — latent bug in a variant that was only
ever run far from the course end. We use the intended 5x5 Qf with zero
weight on the accel state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.dynamics import SimLimits, plant_rollout
from .condense import CondensedQP, _tracking_blocks
from .config import MPCConfig
from .controller import (
    ControllerState,
    MPCStepOut,
    qp_carry_update,
    qp_warm_start,
)
from .linearize import linearize_bicycle
from .qp import solve_box_qp
from .reference import compute_reference


def condense_jerk(A, B, C, x0, xref, reaches_end, cfg: MPCConfig) -> CondensedQP:
    """A (T,5,5), B (T,5,2), C (T,5), x0 (4,) -> condensed QP over
    z = [u_flat (2T); a0 (1)]."""
    T, nu = cfg.T, cfg.nu
    nx = 5
    dtype = A.dtype
    n = T * nu + 1

    x0_5 = jnp.concatenate([x0, jnp.zeros((1,), dtype)])

    def step(carry, inp):
        row, gvec, t = carry
        At, Bt, Ct = inp
        row = jnp.einsum("ij,jk->ik", At, row)
        row = jax.lax.dynamic_update_slice(row, Bt, (0, t * nu))
        gvec = At @ gvec + Ct
        return (row, gvec, t + 1), (row, gvec)

    row0 = jnp.zeros((nx, n), dtype) + x0[0] * 0.0
    row0 = row0.at[4, T * nu].set(1.0)  # x_0's accel state = a0 (free var)
    (_, _, _), (F, g) = jax.lax.scan(step, (row0, x0_5, 0), (A, B, C))
    Ff = F.reshape(T * nx, n)

    # tracking cost: 4x4 blocks from the shared builder, widened to 5x5
    Q4 = _tracking_blocks(xref, reaches_end, cfg, dtype)       # (T,4,4)
    Q = jnp.zeros((T, 5, 5), dtype).at[:, :4, :4].set(Q4)
    r = jnp.concatenate([xref[:, 1:], jnp.zeros((1, T), dtype)]).T  # (T,5)

    QF = jnp.einsum("tij,tjn->tin", Q, F).reshape(T * nx, n)
    P = Ff.T @ QF
    qvec = QF.T @ (g.reshape(T * nx) - r.reshape(T * nx))

    # input cost (u block only)
    r_end = reaches_end[:T]
    r_diag = jnp.where(
        r_end[:, None],
        jnp.full((1, 2), cfg.end_input_weight, dtype),
        jnp.asarray([[cfg.r_accel, cfg.r_steer]], dtype),
    ).reshape(T * nu)
    P = P.at[: T * nu, : T * nu].add(jnp.diag(r_diag))

    # input-rate cost
    eye_u = jnp.eye(T * nu, n, dtype=dtype)
    Dm = eye_u[nu:T * nu] - eye_u[: (T - 1) * nu]
    rd = jnp.tile(jnp.asarray([cfg.rd_accel, cfg.rd_steer], dtype), T - 1)
    P = P + (Dm.T * rd) @ Dm

    # jerk cost on accel-state differences (incl. the free a0 at t=0)
    S = F[:, 4, :]                                            # (T, n): x4_{t+1}
    e_a0 = jnp.zeros((1, n), dtype).at[0, T * nu].set(1.0)
    S_prev = jnp.concatenate([e_a0, S[:-1]])                  # x4_t
    Dj = S - S_prev                                           # (T-1+1?) rows t=0..T-1
    Dj = Dj[: T - 1]                                          # reference: t < T-1
    g4 = g[:, 4]
    g4_prev = jnp.concatenate([jnp.zeros((1,), dtype), g4[:-1]])
    dj_aff = (g4 - g4_prev)[: T - 1]
    P = P + cfg.jerk_weight * (Dj.T @ Dj)
    qvec = qvec + cfg.jerk_weight * (Dj.T @ dj_aff)

    P = 2.0 * (0.5 * (P + P.T))
    qvec = 2.0 * qvec

    # constraints: velocity rows, input boxes, steer-rate rows
    v_rows = F[:, 2, :]
    g_v = g[:, 2]
    acc_rows = eye_u[0::2]
    steer_rows = eye_u[1::2]
    rate_rows = Dm[1::2]
    G = jnp.concatenate([v_rows, acc_rows, steer_rows, rate_rows])
    ones_T = jnp.ones((T,), dtype)
    ones_R = jnp.ones((T - 1,), dtype)
    lo = jnp.concatenate(
        [cfg.min_speed - g_v, cfg.max_decel * ones_T, -cfg.max_steer * ones_T,
         -cfg.max_dsteer * cfg.dt * ones_R]
    )
    hi = jnp.concatenate(
        [cfg.max_speed - g_v, cfg.max_accel * ones_T, cfg.max_steer * ones_T,
         cfg.max_dsteer * cfg.dt * ones_R]
    )
    return CondensedQP(P, qvec, G, lo, hi, Ff, g.reshape(T * nx))


def mpc_step_jerk(
    state4, course, course_speed, valid_len, dl,
    cs: ControllerState, cfg: MPCConfig, wheelbase: float,
) -> MPCStepOut:
    """Jerk-variant controller tick (same contract as ``mpc_step``)."""
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
    warm = qp_warm_start(cs, cfg)

    sol = None
    Ff = gf = xref = None
    for _ in range(max(cfg.max_iter, 1)):
        ref = compute_reference(
            state4, course, course_speed, valid_len, dl, target_idx,
            ov, have_ov, T, cfg.dt, use_speed_channel=cfg.speed_ref,
        )
        xref, target_idx, reaches_end = ref

        controls = jnp.stack([oa, od], axis=-1)
        xbar = plant_rollout(state4, controls, cfg.dt, wheelbase, limits)
        dref = jnp.zeros((T,), dtype)
        A, B, C = linearize_bicycle(
            xbar[:-1, 2], xbar[:-1, 3], dref, cfg.dt, wheelbase, nx=5
        )

        cqp = condense_jerk(A, B, C, state4, xref, reaches_end, cfg)
        (checks, check_iters, s_eps, s_band,
         s_cap, s_ratio) = cfg.solver_schedule
        sol = solve_box_qp(
            cqp.P, cqp.q, cqp.G, cqp.lo, cqp.hi,
            rounds=checks, iters=check_iters,
            rho0=cfg.admm_rho, sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
            polish=cfg.polish,
            warm=warm, eps=s_eps, refactor_band=s_band,
            stall_cap=s_cap, stall_ratio=s_ratio,
            ruiz_iters=cfg.admm_ruiz_iters,
        )
        warm = (sol.x, sol.y, sol.rho) if cfg.warm_start_qp else None
        u = sol.x[: 2 * T].reshape(T, 2)
        oa, od = u[:, 0], u[:, 1]
        Ff, gf = cqp.F, cqp.g
        X = (Ff @ sol.x + gf).reshape(T, 5)
        ov = jnp.concatenate([state4[2:3], X[:, 2]])
        have_ov = jnp.asarray(True)

    solved = (
        jnp.all(jnp.isfinite(sol.x))
        & jnp.isfinite(sol.prim_res)
        & (sol.prim_res < 1e-2)
    )
    # commanded controls clamped to the actuator boxes (see mpc_step)
    accel = jnp.where(
        solved, jnp.clip(oa[0], cfg.max_decel, cfg.max_accel),
        jnp.asarray(cfg.max_decel, dtype))
    steer = jnp.clip(
        jnp.where(solved, od[0], cs.last_steer),
        -cfg.max_steer, cfg.max_steer)

    new_cs = ControllerState(
        oa=jnp.where(solved, oa, jnp.zeros_like(oa)),
        od=jnp.where(solved, od, jnp.zeros_like(od)),
        have_prev=solved,
        ov=jnp.where(solved, ov, jnp.zeros_like(ov)),
        have_ov=solved,
        target_idx=target_idx,
        last_steer=steer,
        **qp_carry_update(sol, solved, cfg),
    )
    X = (Ff @ sol.x + gf).reshape(T, 5)
    plan_xy = jnp.concatenate([state4[None, :2], X[:, :2]])
    return MPCStepOut(accel, steer, new_cs, solved, plan_xy, xref, target_idx)
