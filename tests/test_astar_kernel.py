"""VMEM-resident serial-A* Pallas kernel vs the exact host search.

The kernel (ops/astar_pallas.py) runs best-first expansion with the same
heuristic/edge costs as the host ``MotionPrimitiveSearch``, so unlike the
top-F beam (cost band) it should match host costs near-exactly; grid
quantization (cell merge) is the only divergence source. Runs in Pallas
interpret mode on CPU.
"""

import numpy as np
import pytest

import jax

from mpc_for_av_at_intersection_tpu.lattice import (
    MotionPrimitiveSearch,
    SearchWeights,
    primitive_table,
)
from mpc_for_av_at_intersection_tpu.lattice.wavefront import (
    WavefrontConfig,
    plan_courses_device,
)
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.worlds import free_area, intersection


@pytest.fixture(scope="module")
def geom():
    return bicycle_geometry()


@pytest.fixture(scope="module")
def table(geom):
    return primitive_table(geom)


def host_cost(sc, geom, table, weights=None):
    w = weights or SearchWeights.modified()
    h = MotionPrimitiveSearch(sc, geom, table, margin=geom.radius, weights=w)
    return h.run()[0]


def test_astar_kernel_free_area_exact(geom, table):
    sc = free_area(goal_distance=15.0)
    ch = host_cost(sc, geom, table)
    res = plan_courses_device(
        [sc], geom, engine="astar_interpret", max_expansions=256
    )
    assert bool(np.asarray(res.found)[0])
    ck = float(np.asarray(res.cost)[0])
    assert abs(ck - ch) / ch < 1e-5
    # replayed trajectory reaches the goal area
    npts = int(np.asarray(res.n_points)[0])
    traj = np.asarray(res.trajectory)[0, :npts]
    assert npts > 0
    assert sc.goal_area.distance_to_point(traj[-1, :2]) < 1e-6


def test_astar_kernel_matches_host_on_intersections(geom, table):
    configs = [(1, 1), (2, 3), (3, 2), (4, 1)]
    scenarios = [
        intersection(turn_indicator=t, start_pos=s) for (s, t) in configs
    ]
    hosts = [host_cost(sc, geom, table) for sc in scenarios]
    cfg = WavefrontConfig.for_scenarios(scenarios)
    res = plan_courses_device(
        scenarios, geom, cfg=cfg, engine="astar_interpret",
        max_expansions=4096,
    )
    found = np.asarray(res.found)
    costs = np.asarray(res.cost)
    assert found.all(), f"kernel missed: {found}"
    for i, ch in enumerate(hosts):
        # Upper bound: the kernel never does worse than the host (beam
        # needed a 0.85-1.10 band). It CAN do better: the host's heuristic
        # is inadmissible (the 2.7*theta-excess term overestimates), so
        # host A* is suboptimal on some configs, and the grid merge lets
        # the kernel switch to a cheaper branch the host's exact-pose
        # dedup keeps separate — e.g. (start=1, turn=1): host 59.76 vs
        # kernel 54.78, matching the symmetric (4, 1) config's cost.
        assert costs[i] <= ch * 1.02 + 1e-6, (i, costs[i], ch)
        assert costs[i] >= ch * 0.85 - 1e-6, (i, costs[i], ch)

    # replayed trajectories land in their goal areas with feasible chains
    n_points = np.asarray(res.n_points)
    trajs = np.asarray(res.trajectory)
    for i, sc in enumerate(scenarios):
        tr = trajs[i, : int(n_points[i])]
        assert len(tr) > 50
        # the buffer stores each edge's first K-1 points (reference
        # path_to_full_trajectory convention), so the last sample sits one
        # arc-sample (~0.083 m) before the exact goal pose
        assert sc.goal_area.distance_to_point(tr[-1, :2]) < 0.15


def test_astar_kernel_weighted_variant(geom, table):
    """The SearchWeights cost family (steering/obstacle terms) is baked into
    the kernel as compile-time constants — exercise a non-default preset."""
    sc = intersection(turn_indicator=2, start_pos=1)
    w = SearchWeights.single_lane()
    ch = host_cost(sc, geom, table, weights=w)
    res = plan_courses_device(
        [sc], geom, weights=w, engine="astar_interpret", max_expansions=4096
    )
    assert bool(np.asarray(res.found)[0])
    ck = float(np.asarray(res.cost)[0])
    assert ck <= ch * 1.05 + 1e-6
    assert ck >= ch * 0.95 - 1e-6
