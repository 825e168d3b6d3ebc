"""Agents-layer parity tests, using reference modules as imported oracles."""

import math
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.agents import (
    AgentStates,
    agents_get,
    agents_step,
    check_collision_moving_cars,
    cutoff_index_by_position,
    make_arterial_agent,
    make_roundabout_agent,
    make_t_intersection_agent,
    predict_constant_control,
    stack_agents,
)
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry

HAVE_REF = os.path.isdir("/root/reference/main/lib")
DT = 0.2


def _ref_modules():
    from oracles.ref_loader import add_reference_paths

    add_reference_paths()
    import lib.moving_obstacles as mo
    import lib.moving_obstacles_prediction as mop
    import lib.collision_avoidance as ca
    from lib.car_dimensions import BicycleModelDimensions

    return mo, mop, ca, BicycleModelDimensions()


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
@pytest.mark.parametrize(
    "kind,kwargs",
    [
        ("t", dict(direction=1, turning=False, speed=25 / 3.6, offset=2.0)),
        ("t", dict(direction=-1, turning=True, speed=25 / 3.6, offset=4.0)),
        ("t", dict(direction=1, turning=True, speed=6.0, offset=None)),
        ("rb", dict(direction=1, turning=True, speed=25 / 3.6, offset=None)),
        ("rb", dict(direction=-1, turning=True, speed=7.0, offset=1.0)),
        ("rb", dict(direction=1, turning=False, speed=5.0, offset=None)),
        ("art", dict(x_init=2.0, y_init=-40.0, speed=3.0, offset=1.0)),
    ],
)
def test_scripted_agent_matches_reference(kind, kwargs):
    mo, _, _, car = _ref_modules()
    g = bicycle_geometry()

    if kind == "t":
        ref = mo.MovingObstacleTIntersection(car, dt=DT, **kwargs)
        row = make_t_intersection_agent(**kwargs)
    elif kind == "rb":
        ref = mo.MovingObstacleRoundabout(car, dt=DT, **kwargs)
        row = make_roundabout_agent(**kwargs)
    else:
        ref = mo.MovingObstacleArterial(car, dt=DT, **kwargs)
        row = make_arterial_agent(**kwargs)

    params, states = stack_agents([row], n_slots=2)
    params = type(params)(*[jnp.asarray(f) for f in params])
    states = AgentStates(jnp.asarray(states.pose), jnp.asarray(states.counter))

    for step in range(60):
        want = np.asarray(ref.get(), dtype=np.float64)
        got = np.asarray(agents_get(params, states, DT))[0]
        np.testing.assert_allclose(got, want, atol=1e-9, err_msg=f"step {step}")
        ref.step()
        states = agents_step(params, states, DT, g.wheelbase)


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
def test_prediction_matches_reference():
    _, mop, _, car = _ref_modules()
    g = bicycle_geometry()
    rng = np.random.default_rng(0)
    for _ in range(10):
        obs = np.array([
            rng.normal(0, 10), rng.normal(0, 10), rng.uniform(0, 8),
            rng.uniform(-3, 3), rng.uniform(-1, 1), rng.uniform(-0.4, 0.4),
        ])
        ref = mop.MovingObstaclesPrediction(*obs, sample_time=DT, car_dimensions=car)
        rx, ry, ryaw, _ = ref.state_prediction(7.0)
        got = np.asarray(predict_constant_control(jnp.asarray(obs), DT, g.wheelbase, 35))
        np.testing.assert_allclose(got[:, 0], rx, atol=1e-9)
        np.testing.assert_allclose(got[:, 1], ry, atol=1e-9)
        np.testing.assert_allclose(got[:, 2], ryaw, atol=1e-9)


def _random_path(rng, n, start, heading, step=0.08):
    yaw = heading + rng.normal(0, 0.02, size=n).cumsum()
    xy = start + np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=1) * step, axis=0)
    return np.concatenate([xy, yaw[:, None]], axis=1)


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
@pytest.mark.parametrize("seed", range(12))
def test_collision_scan_matches_reference(seed):
    _, _, ca, car = _ref_modules()
    g = bicycle_geometry()
    rng = np.random.default_rng(seed)

    # detailed ego path and its resampled (coarser) version
    detail = _random_path(rng, 220, rng.normal(0, 5, 2), rng.uniform(-math.pi, math.pi))
    keep = np.sort(rng.choice(np.arange(1, 220), size=50, replace=False))
    ego = np.vstack([detail[:1], detail[keep]])

    # obstacle predictions crossing or missing the path
    n_obs = 2
    obs = []
    for k in range(n_obs):
        cross = detail[rng.integers(50, 200), :2] if seed % 3 != 1 else rng.normal(30, 3, 2)
        direction = rng.uniform(-math.pi, math.pi)
        start = cross - 10 * np.array([math.cos(direction), math.sin(direction)])
        obs.append(_random_path(rng, 35, start, direction, step=0.5))

    want = ca.check_collision_moving_cars(car, ego.copy(), detail.copy(),
                                          [o.copy() for o in obs], frame_window=20)

    N_F, N_T = 128, 256
    ego_pad = np.vstack([ego, np.repeat(ego[-1:], N_F - len(ego), axis=0)])
    det_pad = np.vstack([detail, np.zeros((N_T - len(detail), 3))])
    got = check_collision_moving_cars(
        jnp.asarray(ego_pad), len(ego), jnp.asarray(det_pad), len(detail),
        jnp.asarray(np.stack(obs)), jnp.ones(n_obs, bool),
        jnp.asarray(g.circle_centers), g.radius, frame_window=20, n_frames=N_F,
    )

    if want is None:
        assert not bool(got.found), f"false positive at seed {seed}"
    else:
        assert bool(got.found), f"missed collision at seed {seed}"
        np.testing.assert_allclose(np.asarray(got.xy), want[:2], atol=1e-9)
        assert int(got.frame_idx) == int(want[2])


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
def test_cutoff_index_matches_reference():
    _, _, ca, _ = _ref_modules()
    rng = np.random.default_rng(5)
    pts = _random_path(rng, 150, np.zeros(2), 0.3)
    x, y = pts[77, 0], pts[77, 1]
    want = ca.get_cutoff_curve_by_position_idx(pts.copy(), x, y)
    found, idx = cutoff_index_by_position(jnp.asarray(pts), 150, jnp.array([x, y]))
    assert bool(found)
    assert int(idx) == int(want)
    # miss case
    found2, _ = cutoff_index_by_position(jnp.asarray(pts), 150, jnp.array([999.0, 999.0]))
    assert not bool(found2)


def test_collision_first_hit_key_int32_guard():
    """The lexicographic first-hit key is int32-encoded; configurations
    that would overflow it must be rejected host-side (silent ordering
    corruption otherwise)."""
    import jax.numpy as jnp
    import pytest as _pytest

    from mpc_for_av_at_intersection_tpu.agents import check_collision_moving_cars

    args = lambda n_obs: dict(
        ego_traj=jnp.zeros((8, 3)), n_ego=jnp.int32(8),
        detail_traj=jnp.zeros((8, 3)), n_detail=jnp.int32(8),
        obs_trajs=jnp.zeros((n_obs, 4, 3)), obs_active=jnp.ones((n_obs,), bool),
        circle_centers=jnp.zeros((3, 2)), radius=1.0,
        frame_window=255, n_frames=512,
    )
    # 512*3*1000*511*3 > 2^31-1 -> must raise
    with _pytest.raises(ValueError, match="overflow int32"):
        check_collision_moving_cars(**args(1000))
    # 512*3*700*511*3 < 2^31-1 -> must pass the guard (trace only; actually
    # executing this config would materialize a ~1.6e9-element tensor)
    import jax as _jax

    kw = args(700)
    static = {k: kw.pop(k) for k in ("radius", "frame_window", "n_frames")}
    _jax.eval_shape(lambda kw: check_collision_moving_cars(**kw, **static), kw)
