"""Batched device wavefront search vs the exact host search."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.lattice import (
    MotionPrimitiveSearch,
    SearchWeights,
    primitive_table,
)
from mpc_for_av_at_intersection_tpu.lattice.wavefront import (
    WavefrontConfig,
    prepare_primitives,
    wavefront_search,
)
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.worlds import compile_scenario, intersection, t_intersection
from mpc_for_av_at_intersection_tpu.worlds.obstacles import check_collision


def _run_device(scenarios, geom, cfg):
    table = primitive_table(geom)
    prims = prepare_primitives(table, geom)
    arrs = [compile_scenario(s, margin=geom.radius) for s in scenarios]
    hp = jnp.asarray(np.stack([a.halfplanes for a in arrs]), jnp.float32)
    ov = jnp.asarray(np.stack([a.obstacle_valid for a in arrs]))
    st = jnp.asarray(np.stack([a.start for a in arrs]), jnp.float32)
    gl = jnp.asarray(np.stack([a.goal_point for a in arrs]), jnp.float32)
    gb = jnp.asarray(np.stack([a.goal_area_corners for a in arrs]), jnp.float32)
    tt = jnp.asarray(np.stack([a.goal_theta_tol for a in arrs]), jnp.float32)

    fn = jax.jit(
        jax.vmap(
            lambda h, o, s, g, b, t: wavefront_search(h, o, s, g, b, t, prims, cfg)
        )
    )
    return fn(hp, ov, st, gl, gb, tt)


SCENARIOS = [
    intersection(turn_indicator=1, start_pos=4),
    intersection(turn_indicator=2, start_pos=1),
    intersection(turn_indicator=3, start_pos=2),
    intersection(turn_indicator=1, start_pos=3),
    t_intersection(turn_indicator=1, start_pos=1),
    t_intersection(turn_indicator=2, start_pos=4),
]


def test_wavefront_matches_host_search_cost():
    geom = bicycle_geometry()
    cfg = WavefrontConfig()
    res = _run_device(SCENARIOS, geom, cfg)

    table = primitive_table(geom)
    for i, sc in enumerate(SCENARIOS):
        assert bool(res.found[i]), f"scenario {i} not found by wavefront"
        host = MotionPrimitiveSearch(
            sc, geom, table, margin=geom.radius, weights=SearchWeights.modified()
        )
        cost_host, _, traj_host = host.run()
        cost_dev = float(res.cost[i])
        # NOTE the reference heuristic (dist + 2.7*dtheta) is inadmissible,
        # so the host/reference A* is not guaranteed optimal — the device
        # beam can legitimately return a CHEAPER path (observed: 11 vs 12
        # edges on the straight-through config). Require the device cost to
        # stay within a tight band of the host result either way; the
        # trajectory-validity test below is the hard feasibility check.
        assert 0.85 * cost_host - 1e-6 <= cost_dev <= 1.10 * cost_host + 1e-6, (
            f"scenario {i}: device {cost_dev:.2f} vs host {cost_host:.2f}"
        )


def test_wavefront_trajectory_is_valid():
    """The returned trajectory must be a collision-free continuous primitive
    chain from the start that ends inside the goal region."""
    geom = bicycle_geometry()
    cfg = WavefrontConfig()
    res = _run_device(SCENARIOS, geom, cfg)

    for i, sc in enumerate(SCENARIOS):
        n = int(res.n_points[i])
        traj = np.asarray(res.trajectory[i])[:n]
        # starts at the scenario start
        np.testing.assert_allclose(traj[0], np.asarray(sc.start), atol=1e-5)
        # continuity: consecutive points ~one Euler step apart
        steps = np.linalg.norm(np.diff(traj[:, :2], axis=0), axis=1)
        assert steps.max() < 0.2, f"scenario {i} discontinuity {steps.max()}"
        # collision-free vs all (incl. hidden) obstacles at margin, re-checked
        # host-side with the car's collision circles
        cc = geom.circle_centers
        th = traj[:, 2]
        c, s = np.cos(th), np.sin(th)
        pts = []
        for ox, oy in cc:
            pts.append(
                np.stack([traj[:, 0] + c * ox - s * oy, traj[:, 1] + s * ox + c * oy], axis=1)
            )
        pts = np.concatenate(pts)
        for o in sc.obstacles:
            hp = o.halfplanes(margin=geom.radius)
            assert not check_collision(hp, pts), f"scenario {i} collides with {o}"
        # reaches the goal region
        end = traj[-1]
        ga = sc.goal_area
        assert ga.distance_to_point(end[:2]) < 1.0


WEIGHT_PRESETS = [
    ("base", SearchWeights.base(), intersection(turn_indicator=2, start_pos=1)),
    ("single_lane", SearchWeights.single_lane(), intersection(turn_indicator=1, start_pos=3)),
    ("roundabout_w", SearchWeights.roundabout(), t_intersection(turn_indicator=1, start_pos=1)),
    ("multi_lane", SearchWeights.multi_lane(), intersection(turn_indicator=3, start_pos=2)),
    (
        "multi_lane_obst",
        SearchWeights.multi_lane(h_obstacle=0.5, c_center=0.05),
        intersection(turn_indicator=1, start_pos=4),
    ),
]


@pytest.mark.parametrize("name,w,sc", WEIGHT_PRESETS, ids=[p[0] for p in WEIGHT_PRESETS])
def test_wavefront_weighted_variants_match_host(name, w, sc):
    """The device search supports the full SearchWeights family (the unified
    form of the reference's five search variants) and lands within the beam
    band of the exact host search under each preset."""
    geom = bicycle_geometry()
    table = primitive_table(geom)
    prims = prepare_primitives(table, geom)
    cfg = WavefrontConfig()
    arrs = compile_scenario(sc, margin=geom.radius)

    fn = jax.jit(
        lambda h, o, s, g, b, t: wavefront_search(
            h, o, s, g, b, t, prims, cfg, weights=w
        )
    )
    res = fn(
        jnp.asarray(arrs.halfplanes, jnp.float32),
        jnp.asarray(arrs.obstacle_valid),
        jnp.asarray(arrs.start, jnp.float32),
        jnp.asarray(arrs.goal_point, jnp.float32),
        jnp.asarray(arrs.goal_area_corners, jnp.float32),
        jnp.asarray(arrs.goal_theta_tol, jnp.float32),
    )
    assert bool(res.found), f"{name}: wavefront found no path"

    host = MotionPrimitiveSearch(sc, geom, table, margin=geom.radius, weights=w)
    cost_host, _, _ = host.run()
    cost_dev = float(res.cost)
    assert 0.85 * cost_host - 1e-6 <= cost_dev <= 1.10 * cost_host + 1e-6, (
        f"{name}: device {cost_dev:.2f} vs host {cost_host:.2f}"
    )


def test_for_scenarios_grid_fits_arterial():
    """WavefrontConfig.for_scenarios sizes the grid from the scenario
    geometry: the 100 m arterial cannot fit the intersection-shaped default
    grid, but fits (and plans) on an auto-sized one."""
    from mpc_for_av_at_intersection_tpu.lattice import plan_courses_device
    from mpc_for_av_at_intersection_tpu.worlds import arterial_multi_lanes

    sc = arterial_multi_lanes(num_lanes=2, goal_lane=1)
    geom = bicycle_geometry()
    cfg = WavefrontConfig.for_scenarios(sc)
    # the road spans ~100 m in y; the auto grid must cover it
    assert cfg.ny * cfg.cell >= 100.0
    res = plan_courses_device(sc, geom, cfg=cfg)
    assert bool(res.found[0]), "arterial course not found on auto-sized grid"

    host = MotionPrimitiveSearch(
        sc, geom, primitive_table(geom), margin=geom.radius,
        weights=SearchWeights.modified(),
    )
    cost_host, _, _ = host.run()
    assert 0.85 * cost_host <= float(res.cost[0]) <= 1.10 * cost_host


def test_out_of_grid_telltale():
    """A too-small grid must be distinguishable from a genuinely infeasible
    search: collision-free expansions pruned for leaving the grid are
    counted in ``oob``."""
    from mpc_for_av_at_intersection_tpu.lattice import plan_courses_device
    from mpc_for_av_at_intersection_tpu.worlds import arterial_multi_lanes

    sc = arterial_multi_lanes(num_lanes=2, goal_lane=1)
    geom = bicycle_geometry()
    # deliberately truncate the grid far short of the arterial goal
    small = WavefrontConfig(
        x0=-17.0, y0=-58.0, nx=34, ny=40, ntheta=32, iters=20, max_edges=24
    )
    res = plan_courses_device(sc, geom, cfg=small)
    assert not bool(res.found[0])
    assert int(res.oob[0]) > 0, "expected the out-of-grid telltale to fire"


def test_plan_courses_batch_device_cost_band():
    """Production fleet planning: >= 95% of device plans land within the
    cost band of the exact host search (VERDICT round-1 item 1)."""
    from mpc_for_av_at_intersection_tpu.api import plan_courses_batch

    geom = bicycle_geometry()
    table = primitive_table(geom)
    trajs, stats = plan_courses_batch(SCENARIOS, geom, planner="device")
    assert stats["n_host_fallback"] <= len(SCENARIOS) // 20  # >=95% on device

    in_band = 0
    for i, sc in enumerate(SCENARIOS):
        host = MotionPrimitiveSearch(
            sc, geom, table, margin=geom.radius, weights=SearchWeights.modified()
        )
        cost_host, _, _ = host.run()
        cost_dev = float(stats["device_costs"][i])
        if 0.85 * cost_host - 1e-6 <= cost_dev <= 1.10 * cost_host + 1e-6:
            in_band += 1
        # every returned trajectory is usable either way
        assert len(trajs[i]) >= 100 and trajs[i].shape[1] == 3
    assert in_band >= int(np.ceil(0.95 * len(SCENARIOS)))


def test_sample_fleet_device_planner():
    """sample_intersection_fleet(planner="device") builds a runnable fleet."""
    from mpc_for_av_at_intersection_tpu import api
    from mpc_for_av_at_intersection_tpu.engine import EngineConfig
    from mpc_for_av_at_intersection_tpu.parallel import (
        run_batch_episodes,
        stack_states,
        stack_worlds,
    )

    rng = np.random.default_rng(1)
    geom, worlds, states, meta = api.sample_intersection_fleet(
        8, rng, n_steps=160, planner="device"
    )
    assert len({(m["start_pos"], m["turn_indicator"]) for m in meta}) > 1
    wb, sb = stack_worlds(worlds), stack_states(states)
    final, tel, summary = run_batch_episodes(wb, sb, EngineConfig(), geom, 160)
    assert int(summary["n_unsolved_ticks"]) == 0
    assert int(summary["n_done"]) >= 6, f"only {int(summary['n_done'])}/8 done"
