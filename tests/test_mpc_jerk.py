"""Jerk (comfort) MPC variant vs its float64 sparse oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.core.dynamics import SimLimits, plant_rollout
from mpc_for_av_at_intersection_tpu.mpc import MPCConfig, solve_box_qp
from mpc_for_av_at_intersection_tpu.mpc.jerk import condense_jerk
from mpc_for_av_at_intersection_tpu.mpc.linearize import linearize_bicycle
from mpc_for_av_at_intersection_tpu.mpc.reference import compute_reference

from oracles import qp_oracle

WHEELBASE = 2.86


def _make_course(rng, n=300, dl=0.083):
    turn = rng.normal(0, 0.01, size=n).cumsum()
    yaw = rng.uniform(-np.pi, np.pi) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=1) * dl, axis=0)
    return np.concatenate([xy, yaw[:, None]], axis=1), dl


def _instance(rng, cfg, near_end=False):
    course, dl = _make_course(rng)
    n = len(course)
    i0 = n - 6 if near_end else int(rng.integers(3, 40))
    x0 = np.array([
        course[i0, 0] + rng.normal(0, 0.2),
        course[i0, 1] + rng.normal(0, 0.2),
        rng.uniform(0.0, 8.0),
        course[i0, 2] + rng.normal(0, 0.1),
    ])
    T = cfg.T
    oa = rng.uniform(-2, 2, size=T)
    od = rng.uniform(-0.3, 0.3, size=T)
    ov = np.concatenate([[x0[2]], x0[2] + np.cumsum(oa) * cfg.dt])

    ref = compute_reference(
        jnp.asarray(x0), jnp.asarray(course), jnp.zeros((n,)), n, dl,
        jnp.asarray(max(i0 - 2, 0), jnp.int32), jnp.asarray(ov), True,
        T, cfg.dt,
    )
    xref, _, reaches_end = ref
    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)
    xbar = plant_rollout(jnp.asarray(x0),
                         jnp.stack([jnp.asarray(oa), jnp.asarray(od)], axis=-1),
                         cfg.dt, WHEELBASE, limits)
    A, B, C = linearize_bicycle(xbar[:-1, 2], xbar[:-1, 3], jnp.zeros((T,)),
                                cfg.dt, WHEELBASE, nx=5)
    return (np.asarray(A, np.float64), np.asarray(B, np.float64),
            np.asarray(C, np.float64), x0, np.asarray(xref, np.float64),
            np.asarray(reaches_end))


@pytest.mark.parametrize("seed,near_end", [(0, False), (1, False), (2, True), (3, False)])
def test_jerk_condensed_matches_sparse_oracle(seed, near_end):
    cfg = MPCConfig.with_jerk()
    rng = np.random.default_rng(400 + seed)
    A, B, C, x0, xref, reaches_end = _instance(rng, cfg, near_end)

    qp = qp_oracle.build_sparse_jerk_qp(
        A, B, C, x0, xref, reaches_end,
        w_perp=cfg.w_perp, w_para=cfg.w_para, q_v=cfg.q_v, q_yaw=cfg.q_yaw,
        qf5=(*cfg.qf, 0.0), end_input_weight=cfg.end_input_weight,
        r_accel=cfg.r_accel, r_steer=cfg.r_steer,
        rd_accel=cfg.rd_accel, rd_steer=cfg.rd_steer,
        jerk_weight=cfg.jerk_weight,
        max_accel=cfg.max_accel, max_decel=cfg.max_decel,
        max_dsteer_dt=cfg.max_dsteer * cfg.dt, max_steer=cfg.max_steer,
        max_speed=cfg.max_speed, min_speed=cfg.min_speed,
    )
    z, y, kkt = qp_oracle.solve_sparse_qp(qp)
    assert max(kkt) < 1e-7, f"oracle not certified: {kkt}"
    u_ref = qp_oracle.extract_controls_jerk(qp, z)

    for dtype, tol in [(jnp.float64, 1e-5), (jnp.float32, 1e-3)]:
        cqp = condense_jerk(
            jnp.asarray(A, dtype), jnp.asarray(B, dtype), jnp.asarray(C, dtype),
            jnp.asarray(x0, dtype), jnp.asarray(xref, dtype),
            jnp.asarray(reaches_end), cfg,
        )
        sol = solve_box_qp(cqp.P, cqp.q, cqp.G, cqp.lo, cqp.hi,
                           rounds=cfg.admm_rounds, iters=cfg.admm_iters,
                           rho0=cfg.admm_rho, sigma=cfg.admm_sigma,
                           alpha=cfg.admm_alpha)
        u_dev = np.asarray(sol.x, np.float64)[: 2 * cfg.T].reshape(cfg.T, 2)
        err = np.abs(u_dev - u_ref).max()
        assert err < tol, f"{dtype} control err {err}"


def test_jerk_engine_episode_runs():
    """Full closed loop with the jerk controller on the flagship scenario."""
    import jax

    from mpc_for_av_at_intersection_tpu import api
    from mpc_for_av_at_intersection_tpu.engine import EngineConfig, run_episode

    cfg = EngineConfig(mpc=MPCConfig.with_jerk())
    setup = api.build_intersection(other_vehicles=False, cfg=cfg, n_steps=200)
    run = jax.jit(lambda w, s: run_episode(w, s, setup.cfg, setup.geom, 200))
    final, tel = run(setup.world, setup.state0)
    tel = jax.tree.map(np.asarray, tel)
    assert bool(final.done)
    assert tel.solved.all()
