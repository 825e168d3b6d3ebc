"""Batched (Pallas-path) solver vs the per-scenario vmapped solver."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.mpc import MPCConfig, solve_box_qp
from mpc_for_av_at_intersection_tpu.mpc.qp import solve_box_qp_batched

ON_TPU = jax.default_backend() == "tpu"


def _random_batch(rng, B, n, m):
    Z = rng.normal(size=(B, n, n))
    P = np.einsum("bij,bkj->bik", Z, Z) + 0.1 * np.eye(n)
    q = rng.normal(size=(B, n))
    G = rng.normal(size=(B, m, n))
    center = rng.normal(size=(B, m))
    width = rng.uniform(0.1, 2.0, size=(B, m))
    return (jnp.asarray(P, jnp.float32), jnp.asarray(q, jnp.float32),
            jnp.asarray(G, jnp.float32), jnp.asarray(center - width, jnp.float32),
            jnp.asarray(center + width, jnp.float32))


def test_batched_xla_matches_vmapped():
    rng = np.random.default_rng(0)
    P, q, G, lo, hi = _random_batch(rng, 7, 6, 9)
    ref = jax.vmap(lambda *a: solve_box_qp(*a, rounds=8, iters=60))(P, q, G, lo, hi)
    got = solve_box_qp_batched(P, q, G, lo, hi, rounds=8, iters=60, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(ref.x), atol=2e-4)


def test_batched_pallas_interpret_matches_xla():
    """Pallas kernel semantics via the interpreter (CPU) on a 128-batch."""
    rng = np.random.default_rng(1)
    P, q, G, lo, hi = _random_batch(rng, 128, 6, 9)
    a = solve_box_qp_batched(P, q, G, lo, hi, rounds=4, iters=30, use_pallas=False)
    b = solve_box_qp_batched(
        P, q, G, lo, hi, rounds=4, iters=30, use_pallas=True, interpret=True
    )
    _assert_solutions_match(a, b)
    assert int(b.polished.sum()) >= int(a.polished.sum()) - 4


def _assert_solutions_match(a, b, atol=5e-4, loose=2e-2):
    """Solutions must agree tightly wherever BOTH paths' polish accepted
    (exact active-set solves). On rows where exactly one path's polish
    accepted — the accept test sits on a numerical boundary, and the
    in-kernel lanes-Cholesky vs XLA cho_solve differ in fp ordering — the
    accepted side is the *better* solution, so only loose agreement with
    the other side's raw ADMM iterate is required."""
    ax, bx = np.asarray(a.x), np.asarray(b.x)
    both = np.asarray(a.polished) & np.asarray(b.polished)
    np.testing.assert_allclose(bx[both], ax[both], atol=atol)
    np.testing.assert_allclose(bx[~both], ax[~both], atol=loose)


def test_batched_pad_path():
    rng = np.random.default_rng(2)
    P, q, G, lo, hi = _random_batch(rng, 130, 6, 9)  # forces padding to 256
    a = solve_box_qp_batched(P, q, G, lo, hi, rounds=4, iters=30, use_pallas=False)
    b = solve_box_qp_batched(
        P, q, G, lo, hi, rounds=4, iters=30, use_pallas=True, interpret=True
    )
    _assert_solutions_match(a, b)


def test_batched_pad_smaller_than_lanes():
    """B < 128 (e.g. an 8-ego multi-ego tick) must pad up to one full lane
    block — the round-4 regression was padding with a[-pad:] when pad > B."""
    rng = np.random.default_rng(6)
    P, q, G, lo, hi = _random_batch(rng, 8, 6, 9)
    a = solve_box_qp_batched(P, q, G, lo, hi, rounds=4, iters=30, use_pallas=False)
    b = solve_box_qp_batched(
        P, q, G, lo, hi, rounds=4, iters=30, use_pallas=True, interpret=True
    )
    _assert_solutions_match(a, b)


def test_batched_mpc_step_matches_vmapped_mpc_step():
    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import init_controller_state, mpc_step
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched

    geom = bicycle_geometry()
    # pin the fixed iteration budget: this test checks the BATCHING math
    # identity, and the adaptive early exit legitimately diverges between
    # per-scenario (vmapped while_loop freezes converged rows) and grouped
    # (whole batch iterates until all rows converge) execution on the rare
    # rows the polish rejects
    cfg = MPCConfig(T=13, admm_eps=0.0)
    rng = np.random.default_rng(3)
    B, N = 5, 200
    dl = 0.083
    turn = rng.normal(0, 0.01, size=(B, N)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(B):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 30, size=B)
    states = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0, 8, B), course[np.arange(B), i0, 2]], axis=1
    )

    cs0 = init_controller_state(cfg, jnp.float32)
    cs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), cs0)
    args = (
        jnp.asarray(states, jnp.float32), jnp.asarray(course, jnp.float32),
        jnp.zeros((B, N), jnp.float32), jnp.full((B,), N, jnp.int32),
        jnp.full((B,), dl, jnp.float32),
    )

    ref = jax.vmap(lambda s, c, v, n, d, k: mpc_step(s, c, v, n, d, k, cfg, geom.wheelbase))(
        *args, cs
    )
    got = mpc_step_batched(*args, cs, cfg, geom.wheelbase, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got.accel), np.asarray(ref.accel), atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.steer), np.asarray(ref.steer), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got.target_idx), np.asarray(ref.target_idx))


@pytest.mark.parametrize("pallas_interpret", [False, True])
def test_batched_jerk_matches_vmapped_jerk(pallas_interpret):
    """The jerk (comfort) variant through the natively batched solver —
    decision vector [u_flat; a0] (2T+1 vars) — vs the vmapped
    single-scenario ``mpc_step_jerk``."""
    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import init_controller_state
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched
    from mpc_for_av_at_intersection_tpu.mpc.jerk import mpc_step_jerk

    geom = bicycle_geometry()
    # fixed budget: this test checks the jerk BATCHING/kernel math
    # identity; the adaptive exit legitimately diverges between the
    # per-scenario and lane-grouped paths on polish-rejected rows (see
    # test_batched_mpc_step_matches_vmapped_mpc_step)
    import dataclasses
    cfg = dataclasses.replace(MPCConfig.with_jerk(), admm_eps=0.0)
    rng = np.random.default_rng(5)
    B, N = 128 if pallas_interpret else 5, 200
    dl = 0.083
    turn = rng.normal(0, 0.01, size=(B, N)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(B):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 30, size=B)
    states = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0, 8, B), course[np.arange(B), i0, 2]], axis=1
    )

    cs0 = init_controller_state(cfg, jnp.float32)
    cs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), cs0)
    args = (
        jnp.asarray(states, jnp.float32), jnp.asarray(course, jnp.float32),
        jnp.zeros((B, N), jnp.float32), jnp.full((B,), N, jnp.int32),
        jnp.full((B,), dl, jnp.float32),
    )

    ref = jax.vmap(
        lambda s, c, v, n, d, k: mpc_step_jerk(s, c, v, n, d, k, cfg, geom.wheelbase)
    )(*args, cs)
    got = mpc_step_batched(
        *args, cs, cfg, geom.wheelbase,
        use_pallas=pallas_interpret, interpret=pallas_interpret,
    )
    assert np.asarray(got.solved).all()
    np.testing.assert_allclose(np.asarray(got.accel), np.asarray(ref.accel), atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.steer), np.asarray(ref.steer), atol=5e-4)
    np.testing.assert_array_equal(np.asarray(got.target_idx), np.asarray(ref.target_idx))


def test_lanes_pipeline_matches_xla():
    """The fully lanes-resident TPU path (condense kernel -> in-kernel Ruiz
    + ADMM -> lanes polish) vs the XLA reference path, via interpret mode."""
    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import init_controller_state
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched

    geom = bicycle_geometry()
    cfg = MPCConfig(T=13)
    rng = np.random.default_rng(3)
    B, N = 128, 200
    dl = 0.083
    turn = rng.normal(0, 0.01, size=(B, N)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(B):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 30, size=B)
    states = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0, 8, B), course[np.arange(B), i0, 2]], axis=1)
    cs0 = init_controller_state(cfg, jnp.float32)
    cs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), cs0)
    args = (jnp.asarray(states, jnp.float32), jnp.asarray(course, jnp.float32),
            jnp.zeros((B, N), jnp.float32), jnp.full((B,), N, jnp.int32),
            jnp.full((B,), dl, jnp.float32))
    ref = mpc_step_batched(*args, cs, cfg, geom.wheelbase, use_pallas=False)
    got = mpc_step_batched(*args, cs, cfg, geom.wheelbase,
                           use_pallas=True, interpret=True)
    sa, sb = np.asarray(ref.solved), np.asarray(got.solved)
    both = sa & sb
    assert both.sum() >= B - 2
    np.testing.assert_allclose(np.asarray(got.accel)[both],
                               np.asarray(ref.accel)[both], atol=2e-3)
    np.testing.assert_allclose(np.asarray(got.steer)[both],
                               np.asarray(ref.steer)[both], atol=2e-3)
    np.testing.assert_array_equal(np.asarray(got.target_idx),
                                  np.asarray(ref.target_idx))


def test_adaptive_early_exit_matches_fixed_budget():
    """eps/stall-driven early exit + lazy refactorization must land on the
    same polished solutions as the fixed-budget schedule (both
    interpret-mode kernel paths) wherever both polish — the polished
    solves are exact active-set resolves, so the iteration policy cannot
    change them. (Unpolished rows legitimately differ: the rho schedule
    diverges once refactorization is lazy.)"""
    rng = np.random.default_rng(7)
    P, q, G, lo, hi = _random_batch(rng, 128, 6, 9)
    fixed = solve_box_qp_batched(
        P, q, G, lo, hi, rounds=16, iters=32, use_pallas=True, interpret=True
    )
    adap = solve_box_qp_batched(
        P, q, G, lo, hi, rounds=16, iters=32, use_pallas=True, interpret=True,
        eps=1e-4, refactor_band=5.0, stall_cap=3e-3, stall_ratio=0.5,
    )
    both = np.asarray(fixed.polished) & np.asarray(adap.polished)
    assert both.sum() >= 30
    np.testing.assert_allclose(np.asarray(adap.x)[both],
                               np.asarray(fixed.x)[both], atol=5e-4)
    # the stall exit must actually fire: no row may burn the full budget
    # only to land where it already was two blocks earlier
    checks = np.asarray(adap.checks).astype(int)
    assert checks.mean() < 12 and checks.min() <= 4


def test_warm_start_resolve_is_faster_and_agrees():
    """Re-solving the same instances warm-started from their own solution
    must converge in the minimum one block and reproduce the solution."""
    rng = np.random.default_rng(8)
    P, q, G, lo, hi = _random_batch(rng, 128, 6, 9)
    kw = dict(rounds=16, iters=32, use_pallas=True, interpret=True,
              eps=1e-4, refactor_band=5.0, stall_cap=3e-3, stall_ratio=0.5)
    cold = solve_box_qp_batched(P, q, G, lo, hi, **kw)
    cold_checks = int(np.asarray(cold.checks)[0])
    warm = solve_box_qp_batched(
        P, q, G, lo, hi, **kw,
        warm=(cold.x, cold.y, cold.rho),
    )
    # rows whose cold solve converged must re-converge in the minimum one
    # block from their own solution (rows that hit the check cap cold are
    # adversarial instances with no fixed point to warm from)
    conv = np.asarray(cold.checks) < 16
    assert conv.sum() >= 100
    # eps-converged rows re-converge in 1 block; rows that exited on the
    # stall rule need one extra block to re-detect the stall
    assert np.asarray(warm.checks)[conv].max() <= 2
    both = conv & np.asarray(cold.polished) & np.asarray(warm.polished)
    np.testing.assert_allclose(np.asarray(warm.x)[both],
                               np.asarray(cold.x)[both], atol=5e-4)


def test_warm_start_single_scenario_xla():
    """The single-scenario XLA twin: warm re-solve exits in one check and
    agrees with the cold solve."""
    rng = np.random.default_rng(9)
    P, q, G, lo, hi = _random_batch(rng, 4, 6, 9)
    kw = dict(rounds=16, iters=32, eps=1e-3, refactor_band=5.0)
    cold = jax.vmap(lambda *a: solve_box_qp(*a, **kw))(P, q, G, lo, hi)
    warm = jax.vmap(
        lambda p, q_, g, l, h, wx, wy, wr: solve_box_qp(
            p, q_, g, l, h, warm=(wx, wy, wr), **kw)
    )(P, q, G, lo, hi, cold.x, cold.y, cold.rho)
    conv = np.asarray(cold.checks) < 16
    assert conv.sum() >= 2
    assert np.asarray(warm.checks)[conv].max() <= 2
    both = conv & np.asarray(cold.polished) & np.asarray(warm.polished)
    np.testing.assert_allclose(np.asarray(warm.x)[both],
                               np.asarray(cold.x)[both], atol=5e-4)


def test_mpc_step_warm_carry_across_ticks():
    """Two consecutive controller ticks: the second tick's QP must be
    warm-started from the first (have_qp set, fewer checks than a cold
    solve of the same tick), with identical controls to a no-warm run
    wherever both solves polished."""
    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import init_controller_state
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched

    geom = bicycle_geometry()
    cfg = MPCConfig(T=13)
    assert cfg.warm_start_qp and cfg.admm_eps > 0
    rng = np.random.default_rng(10)
    B, N = 128, 200
    dl = 0.083
    turn = rng.normal(0, 0.01, size=(B, N)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(B):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 30, size=B)
    states = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0, 8, B), course[np.arange(B), i0, 2]], axis=1
    )

    cs0 = init_controller_state(cfg, jnp.float32)
    cs = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), cs0)
    args = (
        jnp.asarray(states, jnp.float32), jnp.asarray(course, jnp.float32),
        jnp.zeros((B, N), jnp.float32), jnp.full((B,), N, jnp.int32),
        jnp.full((B,), dl, jnp.float32),
    )

    out1 = mpc_step_batched(*args, cs, cfg, geom.wheelbase,
                            use_pallas=True, interpret=True)
    assert np.asarray(out1.state.have_qp).all()
    # advance the plant one tick along the commanded control
    from mpc_for_av_at_intersection_tpu.core.dynamics import SimLimits, plant_step
    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)
    states2 = jax.vmap(
        lambda s, a, d: plant_step(s, jnp.stack([a, d]), cfg.dt,
                                   geom.wheelbase, limits)
    )(args[0], out1.accel, out1.steer)
    args2 = (states2,) + args[1:]

    out_warm = mpc_step_batched(*args2, out1.state, cfg, geom.wheelbase,
                                use_pallas=True, interpret=True)
    cold_state = out1.state._replace(
        have_qp=jnp.zeros_like(out1.state.have_qp))
    out_cold = mpc_step_batched(*args2, cold_state, cfg, geom.wheelbase,
                                use_pallas=True, interpret=True)

    # random wiggly-course instances include a few adversarial rows the
    # polish rejects either way — require near-universal solve success and
    # control agreement wherever both the warm and cold ticks solved
    sw = np.asarray(out_warm.solved)
    sc = np.asarray(out_cold.solved)
    assert sw.sum() >= 126
    both = sw & sc
    da = np.abs(np.asarray(out_warm.accel) - np.asarray(out_cold.accel))[both]
    ds = np.abs(np.asarray(out_warm.steer) - np.asarray(out_cold.steer))[both]
    # solved-but-unpolished rows carry the solver's documented ~prim<1e-2
    # tolerance; the bulk must agree tightly, every row loosely
    assert np.quantile(da, 0.95) < 2e-3 and np.quantile(ds, 0.95) < 2e-3
    assert da.max() < 2e-2 and ds.max() < 2e-2


def test_fused_solve_polish_matches_two_launch():
    """The single-launch Ruiz+ADMM+polish kernel must be BIT-identical to
    the two-launch pipeline it fused (same op sequence, shared bodies)."""
    from mpc_for_av_at_intersection_tpu.mpc.qp import solve_box_qp_lanes
    from mpc_for_av_at_intersection_tpu.ops.admm_pallas import LANES

    rng = np.random.default_rng(12)
    B, n, m = 128, 6, 9
    P, q, G, lo, hi = _random_batch(rng, B, n, m)
    Bt = B // LANES

    def t_mat(a, r, c):
        return a.reshape(Bt, LANES, r, c).transpose(0, 2, 3, 1)

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    args = (t_mat(P, n, n), t_vec(q, n), t_mat(G, m, n),
            t_vec(lo, m), t_vec(hi, m))
    kw = dict(rounds=16, iters=32, eps=1e-4, refactor_band=5.0,
              stall_cap=1e-3, stall_ratio=0.5, interpret=True)
    a = solve_box_qp_lanes(*args, B0=B, fused=True, **kw)
    b = solve_box_qp_lanes(*args, B0=B, fused=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
    np.testing.assert_array_equal(np.asarray(a.polished), np.asarray(b.polished))
    np.testing.assert_array_equal(np.asarray(a.prim_res), np.asarray(b.prim_res))
    np.testing.assert_array_equal(np.asarray(a.checks), np.asarray(b.checks))
    np.testing.assert_array_equal(np.asarray(a.rho), np.asarray(b.rho))

    # warm-started path too
    aw = solve_box_qp_lanes(*args, B0=B, fused=True,
                            warm=(a.x, a.y, a.rho), **kw)
    bw = solve_box_qp_lanes(*args, B0=B, fused=False,
                            warm=(a.x, a.y, a.rho), **kw)
    np.testing.assert_array_equal(np.asarray(aw.x), np.asarray(bw.x))
    np.testing.assert_array_equal(np.asarray(aw.checks), np.asarray(bw.checks))
