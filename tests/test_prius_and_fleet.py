"""BASELINE configs 2 and 4: Prius end-to-end tracking + 8-ego intersection."""

import numpy as np
import pytest

import jax

from mpc_for_av_at_intersection_tpu import api
from mpc_for_av_at_intersection_tpu.agents import stack_agents
from mpc_for_av_at_intersection_tpu.engine import (
    EngineConfig,
    init_engine_state,
    init_multi_ego_state,
    make_multi_ego_world,
    make_world,
    run_episode,
    run_multi_ego_episode,
)
from mpc_for_av_at_intersection_tpu.lattice import (
    MotionPrimitiveSearch,
    SearchWeights,
    primitive_table,
)
from mpc_for_av_at_intersection_tpu.models import prius_geometry
from mpc_for_av_at_intersection_tpu.worlds import intersection, intersection_multi_lanes


def test_prius_tracking_end_to_end():
    """Config 2: Prius kinematic primitives + single-vehicle tracking MPC on
    a fixed reference path (no traffic)."""
    geom = prius_geometry()
    table = primitive_table(geom)  # kinematic Prius arcs (L=4)
    sc = intersection(turn_indicator=2, start_pos=1)
    search = MotionPrimitiveSearch(
        sc, geom, table, margin=geom.radius, weights=SearchWeights.modified()
    )
    _, _, traj = search.run()

    cfg = EngineConfig()
    params, ag = stack_agents([], n_slots=cfg.n_agents)
    world = make_world(traj, params, cfg)
    st0 = init_engine_state(world, ag, cfg, 200)
    run = jax.jit(lambda w, s: run_episode(w, s, cfg, geom, 200))
    final, tel = run(world, st0)
    tel = jax.tree.map(np.asarray, tel)

    assert bool(final.done)
    k = int(final.ticks_to_goal)
    assert np.hypot(tel.x[k - 1] - traj[-1, 0], tel.y[k - 1] - traj[-1, 1]) < 1.6
    assert tel.solved.all()
    # tracking quality along the way
    assert np.nanmax(tel.xref_dev[: k - 1]) < 2.0


def test_eight_ego_intersection():
    """Config 4: 8 egos (2 lanes x 4 arms) on a 2-lane intersection, full
    bi-level stack with receding-horizon replanning each tick."""
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry

    geom = bicycle_geometry()
    table = primitive_table(geom)
    cfg = EngineConfig()
    n_steps = 300

    combos = [
        (1, 2, 1), (1, 3, 2),
        (2, 2, 1), (2, 3, 2),
        (3, 2, 1), (3, 3, 2),
        (4, 2, 1), (4, 3, 2),
    ]  # (start_pos, turn, start_lane): straights in lane 1, rights in lane 2
    trajs = []
    for start, turn, lane in combos:
        sc = intersection_multi_lanes(
            turn_indicator=turn, start_pos=start, start_lane=lane,
            goal_lane=lane, number_of_lanes=2,
        )
        s = MotionPrimitiveSearch(sc, geom, table, margin=geom.radius,
                                  weights=SearchWeights.modified())
        _, _, t = s.run()
        trajs.append(t)

    params, ag = stack_agents([], n_slots=2)
    cfg8 = EngineConfig(n_agents=2)
    world = make_multi_ego_world(trajs, params, cfg8)
    st0 = init_multi_ego_state(world, ag, cfg8, n_steps)
    run = jax.jit(lambda w, s: run_multi_ego_episode(w, s, cfg8, geom, n_steps))
    final, tel = run(world, st0)
    tel = jax.tree.map(np.asarray, tel)

    n_done = int(np.sum(np.asarray(final.done)))
    # decentralized yielding has no priority rule; most egos must still
    # resolve the interaction and finish within the 60 s horizon
    assert n_done >= 6, f"only {n_done}/8 egos finished"

    # NO ego-ego collision at any tick among all pairs
    cc = geom.circle_centers
    x, y, yaw = tel.x, tel.y, tel.yaw     # (T, 8)
    T = x.shape[0]
    min_clear = np.inf
    for k in range(T):
        pts = []
        for e in range(8):
            c, s = np.cos(yaw[k, e]), np.sin(yaw[k, e])
            for ox, oy in cc:
                pts.append([x[k, e] + c * ox - s * oy, y[k, e] + s * ox + c * oy])
        pts = np.asarray(pts).reshape(8, len(cc), 2)
        for a in range(8):
            for b in range(a + 1, 8):
                d = np.linalg.norm(
                    pts[a][:, None, :] - pts[b][None, :, :], axis=-1
                ).min()
                min_clear = min(min_clear, d)
    assert min_clear > 2 * geom.radius * 0.7, f"clearance {min_clear}"


def test_sixteen_ego_fleet_batched():
    """16 egos (4 lanes x 4 arms) on a 4-lane intersection through the
    natively batched multi-ego path (run_multi_ego_episode defaults to
    batched=True at E >= 8). Outcome oracle: majority finish, zero
    ego-ego collision at any tick."""
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry

    geom = bicycle_geometry()
    table = primitive_table(geom)
    n_steps = 300

    combos = []
    for start in (1, 2, 3):
        combos += [(start, 1, 1), (start, 2, 2), (start, 2, 3), (start, 3, 4)]
    # east arm (start=4): its start pose carries the reference's single-lane
    # offset quirk (QUIRKS #12), which makes lanes 1-2 infeasible on a
    # 5-lane road — its 3 egos use lanes 3-5, plus one extra from arm 2
    combos += [(2, 3, 5), (4, 2, 3), (4, 2, 4), (4, 3, 5)]
    trajs = []
    for start, turn, lane in combos:
        sc = intersection_multi_lanes(
            turn_indicator=turn, start_pos=start, start_lane=lane,
            goal_lane=lane, number_of_lanes=5,
        )
        s = MotionPrimitiveSearch(sc, geom, table, margin=geom.radius,
                                  weights=SearchWeights.modified())
        _, _, t = s.run()
        trajs.append(t)
    assert len(trajs) == 16

    params, ag = stack_agents([], n_slots=2)
    cfg16 = EngineConfig(n_agents=2)
    world = make_multi_ego_world(trajs, params, cfg16)
    st0 = init_multi_ego_state(world, ag, cfg16, n_steps)
    run = jax.jit(lambda w, s: run_multi_ego_episode(w, s, cfg16, geom, n_steps))
    final, tel = run(world, st0)
    tel = jax.tree.map(np.asarray, tel)

    n_done = int(np.sum(np.asarray(final.done)))
    # 16 unprioritized egos at one junction: gridlock risk is real; a
    # majority must still clear within the 60 s horizon
    assert n_done >= 9, f"only {n_done}/16 egos finished"

    cc = geom.circle_centers
    x, y, yaw = tel.x, tel.y, tel.yaw     # (T, 16)
    E = 16
    c, s = np.cos(yaw), np.sin(yaw)
    pts = np.stack(
        [
            np.stack([x + c * ox - s * oy, y + s * ox + c * oy], axis=-1)
            for ox, oy in cc
        ],
        axis=2,
    )                                      # (T, E, n_cc, 2)
    diffs = pts[:, :, None, :, None, :] - pts[:, None, :, None, :, :]
    dist = np.linalg.norm(diffs, axis=-1)  # (T, E, E, cc, cc)
    iu = np.triu_indices(E, k=1)
    min_clear = dist[:, iu[0], iu[1]].min()
    assert min_clear > 2 * geom.radius * 0.7, f"clearance {min_clear}"
