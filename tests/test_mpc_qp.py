"""MPC solver tests: condensed device QP vs float64 sparse oracle vs scipy."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.mpc import (
    MPCConfig,
    condense,
    kkt_residuals,
    linearize_bicycle,
    solve_box_qp,
)
from mpc_for_av_at_intersection_tpu.mpc.condense import prediction_matrices
from mpc_for_av_at_intersection_tpu.mpc.reference import compute_reference
from mpc_for_av_at_intersection_tpu.core.dynamics import SimLimits, plant_rollout

from oracles import qp_oracle

WHEELBASE = 2.86


def _random_box_qp(rng, n, m):
    Z = rng.normal(size=(n, n))
    P = Z.T @ Z + 0.1 * np.eye(n)
    q = rng.normal(size=n)
    G = rng.normal(size=(m, n))
    center = rng.normal(size=m)
    width = rng.uniform(0.1, 2.0, size=m)
    return P, q, G, center - width, center + width


@pytest.mark.parametrize("seed", range(6))
def test_solve_box_qp_vs_slsqp(seed):
    from scipy.optimize import minimize

    rng = np.random.default_rng(seed)
    P, q, G, lo, hi = _random_box_qp(rng, 6, 9)

    sol = solve_box_qp(*[jnp.asarray(a) for a in (P, q, G, lo, hi)],
                       rounds=8, iters=60)
    x = np.asarray(sol.x)

    cons = [
        {"type": "ineq", "fun": lambda z, G=G, hi=hi: hi - G @ z,
         "jac": lambda z, G=G: -G},
        {"type": "ineq", "fun": lambda z, G=G, lo=lo: G @ z - lo,
         "jac": lambda z, G=G: G},
    ]
    res = minimize(
        lambda z: 0.5 * z @ P @ z + q @ z, np.zeros(6), jac=lambda z: P @ z + q,
        constraints=cons, method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    assert res.success
    np.testing.assert_allclose(x, res.x, atol=2e-5)
    stat, prim, comp = [float(v) for v in
                        kkt_residuals(*[jnp.asarray(a) for a in (P, q, G, lo, hi)],
                                      sol.x, sol.y)]
    assert prim < 1e-6
    assert stat < 1e-4


def _make_course(rng, n=300, dl=0.083):
    turn = rng.normal(0, 0.01, size=n).cumsum()
    yaw = rng.uniform(-np.pi, np.pi) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=1) * dl, axis=0)
    return np.concatenate([xy, yaw[:, None]], axis=1), dl


def _make_instance(rng, cfg, near_end=False, with_prev=True):
    """Build (A, B, C, x0, xref, reaches_end) in float64 via the jax pipeline."""
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
    if with_prev:
        oa = rng.uniform(-2, 2, size=T)
        od = rng.uniform(-0.3, 0.3, size=T)
        ov = np.concatenate([[x0[2]], x0[2] + np.cumsum(oa) * cfg.dt])
        have_ov = True
    else:
        oa = np.zeros(T)
        od = np.zeros(T)
        ov = np.zeros(T + 1)
        have_ov = False

    coursej = jnp.asarray(course)
    ref = compute_reference(
        jnp.asarray(x0), coursej, jnp.zeros((n,)), n, dl,
        jnp.asarray(max(i0 - 2, 0), jnp.int32), jnp.asarray(ov), have_ov,
        T, cfg.dt, use_speed_channel=False,
    )
    xref, _, reaches_end = ref

    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)
    xbar = plant_rollout(jnp.asarray(x0), jnp.stack([jnp.asarray(oa), jnp.asarray(od)], axis=-1),
                         cfg.dt, WHEELBASE, limits)
    A, B, C = linearize_bicycle(xbar[:-1, 2], xbar[:-1, 3], jnp.zeros((T,)),
                                cfg.dt, WHEELBASE)
    return (np.asarray(A, np.float64), np.asarray(B, np.float64),
            np.asarray(C, np.float64), x0, np.asarray(xref, np.float64),
            np.asarray(reaches_end))


def _oracle_solve(A, B, C, x0, xref, reaches_end, cfg):
    qp = qp_oracle.build_sparse_mpc_qp(
        A, B, C, x0, xref, reaches_end,
        w_perp=cfg.w_perp, w_para=cfg.w_para, q_v=cfg.q_v, q_yaw=cfg.q_yaw,
        qf=cfg.qf, end_input_weight=cfg.end_input_weight,
        r_accel=cfg.r_accel, r_steer=cfg.r_steer,
        rd_accel=cfg.rd_accel, rd_steer=cfg.rd_steer,
        max_accel=cfg.max_accel, max_decel=cfg.max_decel,
        max_dsteer_dt=cfg.max_dsteer * cfg.dt, max_steer=cfg.max_steer,
        max_speed=cfg.max_speed, min_speed=cfg.min_speed,
    )
    z, y, kkt = qp_oracle.solve_sparse_qp(qp)
    assert max(kkt) < 1e-7, f"oracle not certified: kkt={kkt}"
    return qp_oracle.extract_controls(qp, z), qp_oracle.extract_states(qp, z)


def _device_solve(A, B, C, x0, xref, reaches_end, cfg, dtype):
    cqp = condense(
        jnp.asarray(A, dtype), jnp.asarray(B, dtype), jnp.asarray(C, dtype),
        jnp.asarray(x0, dtype), jnp.asarray(xref, dtype),
        jnp.asarray(reaches_end), cfg,
    )
    sol = solve_box_qp(cqp.P, cqp.q, cqp.G, cqp.lo, cqp.hi,
                       rounds=cfg.admm_rounds, iters=cfg.admm_iters,
                       rho0=cfg.admm_rho, sigma=cfg.admm_sigma,
                       alpha=cfg.admm_alpha, polish=cfg.polish)
    u = np.asarray(sol.x, np.float64).reshape(cfg.T, 2)
    X = np.asarray(cqp.F @ sol.x + cqp.g, np.float64).reshape(cfg.T, 4)
    return u, X, bool(sol.polished)


# Horizons: the reference ships T=13 (main/config/mpc_config.json:4);
# BASELINE.md sets the parity budget at the N=20 bicycle horizon — both are
# first-class here.
HORIZONS = [13, 20]


@pytest.mark.parametrize("T", HORIZONS)
@pytest.mark.parametrize("seed,near_end,with_prev", [
    (0, False, True), (1, False, True), (2, False, False),
    (3, True, True), (4, True, False), (5, False, True),
    (6, False, True), (7, True, True),
])
def test_condensed_matches_sparse_oracle_f64(seed, near_end, with_prev, T):
    cfg = MPCConfig(T=T)
    rng = np.random.default_rng(100 + seed)
    inst = _make_instance(rng, cfg, near_end=near_end, with_prev=with_prev)
    u_ref, X_ref = _oracle_solve(*inst, cfg)
    u_dev, X_dev, polished = _device_solve(*inst, cfg, jnp.float64)
    err = np.abs(u_dev - u_ref).max()
    assert err < 1e-5, f"f64 T={T} control err {err} (polished={polished})"
    np.testing.assert_allclose(X_dev, X_ref[1:], atol=1e-4)


@pytest.mark.parametrize("T", HORIZONS)
@pytest.mark.parametrize("seed,near_end,with_prev", [
    (0, False, True), (1, False, True), (2, False, False),
    (3, True, True), (4, True, False), (5, False, True),
])
def test_condensed_matches_sparse_oracle_f32(seed, near_end, with_prev, T):
    """The shipping fp32 path must stay within the 1e-3 parity budget
    (BASELINE.md: control error <= 1e-3 vs reference at N=20)."""
    cfg = MPCConfig(T=T)
    rng = np.random.default_rng(100 + seed)
    inst = _make_instance(rng, cfg, near_end=near_end, with_prev=with_prev)
    u_ref, _ = _oracle_solve(*inst, cfg)
    u_dev, _, _ = _device_solve(*inst, cfg, jnp.float32)
    err = np.abs(u_dev - u_ref).max()
    assert err < 1e-3, f"f32 T={T} control err {err}"


def test_speed_ref_variant_against_oracle():
    cfg = MPCConfig.with_speed_ref()
    rng = np.random.default_rng(7)
    course, dl = _make_course(rng)
    n = len(course)
    i0 = 10
    x0 = np.array([course[i0, 0], course[i0, 1], 3.0, course[i0, 2]])
    cutoff = 60
    cv = np.full(n, cfg.target_speed)
    cv[cutoff:] = 0.0

    ref = compute_reference(
        jnp.asarray(x0), jnp.asarray(course), jnp.asarray(cv), n, dl,
        jnp.asarray(i0, jnp.int32), jnp.zeros(cfg.T + 1), False,
        cfg.T, cfg.dt, use_speed_channel=True,
    )
    xref, _, reaches_end = ref
    assert np.any(np.asarray(xref[2]) > 0)

    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)
    xbar = plant_rollout(jnp.asarray(x0), jnp.zeros((cfg.T, 2)), cfg.dt, WHEELBASE, limits)
    A, B, C = linearize_bicycle(xbar[:-1, 2], xbar[:-1, 3], jnp.zeros((cfg.T,)),
                                cfg.dt, WHEELBASE)
    inst = (np.asarray(A, np.float64), np.asarray(B, np.float64),
            np.asarray(C, np.float64), x0, np.asarray(xref, np.float64),
            np.asarray(reaches_end))
    u_ref, _ = _oracle_solve(*inst, cfg)
    u_dev, _, _ = _device_solve(*inst, cfg, jnp.float32)
    assert np.abs(u_dev - u_ref).max() < 1e-3


def test_prediction_matrices_consistency():
    """X = F u + g must equal the rolled-out linear dynamics."""
    rng = np.random.default_rng(3)
    T, nx, nu = 5, 4, 2
    A = rng.normal(size=(T, nx, nx)) * 0.3 + np.eye(nx)
    B = rng.normal(size=(T, nx, nu))
    C = rng.normal(size=(T, nx))
    x0 = rng.normal(size=nx)
    u = rng.normal(size=(T, nu))

    F, g = prediction_matrices(jnp.asarray(A), jnp.asarray(B), jnp.asarray(C),
                               jnp.asarray(x0))
    X = (np.asarray(F).reshape(T * nx, T * nu) @ u.reshape(-1)
         + np.asarray(g).reshape(-1)).reshape(T, nx)

    x = x0
    for t in range(T):
        x = A[t] @ x + B[t] @ u[t] + C[t]
        np.testing.assert_allclose(X[t], x, rtol=1e-5, atol=1e-5)
