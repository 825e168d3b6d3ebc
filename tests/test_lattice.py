"""Lattice layer: primitive-table parity, generic A* contract, search parity
with the reference implementation on real scenarios."""

import math
import os
import pickle

import numpy as np
import pytest

from mpc_for_av_at_intersection_tpu.lattice import (
    AStar,
    MotionPrimitiveSearch,
    SearchWeights,
    primitive_table,
)
from mpc_for_av_at_intersection_tpu.lattice.astar import NoPathError
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.worlds import intersection

HAVE_REF = os.path.isdir("/root/reference/main/lib")
REF_PKL = "/root/reference/main/data/motion_primitives_bicycle_model"
REF_PKL_PRIUS = "/root/reference/main/data/motion_primitives_prius"


class _MPStub:
    pass


def _load_ref_pickles(path=REF_PKL):
    class U(pickle.Unpickler):
        def find_class(self, m, n):
            return _MPStub if n == "MotionPrimitive" else super().find_class(m, n)

    out = {}
    import pathlib

    for f in pathlib.Path(path).glob("*.pkl"):
        with open(f, "rb") as fh:
            mp = U(fh).load()
        out[mp.name] = mp
    return out


@pytest.mark.skipif(not HAVE_REF, reason="reference pickles unavailable")
def test_primitive_table_matches_reference_pickles():
    table = primitive_table(bicycle_geometry())
    ref = _load_ref_pickles()
    assert set(table.names) == set(ref.keys())
    for i, name in enumerate(table.names):
        np.testing.assert_allclose(table.points[i], ref[name].points, atol=1e-12)
        assert table.lengths[i] == pytest.approx(ref[name].total_length, abs=1e-12)


@pytest.mark.skipif(not HAVE_REF, reason="reference pickles unavailable")
def test_prius_pickles_quantified_divergence():
    """QUIRKS #19: the committed PyBullet Prius pickles are internally
    inconsistent and partly degenerate, so our kinematic Prius table is a
    conscious replacement, not an approximation of them. This test pins the
    *measured* facts that justify that decision:

    (a) every pickle's ``total_length`` was computed BEFORE the
        ``points[:, :2] /= 0.3`` scale-up
        (create_motion_primitives_prius.py:124-127), so it is exactly 0.3x
        the points' true arc length;
    (b) the four high-steer episodes stalled in PyBullet: left4/right4
        travel < 0.25 m (nominal ~5 m at 8.3 m/s for 0.6 s of recording)
        and END BEHIND the start pose; left3/right3 travel < 3.7 m;
    (c) therefore the divergence from ANY constant-steer kinematic arc is
        meters — the straight pickle alone spans 8.4 m vs the kinematic
        4.98 m (the pickles record a longer window than the bicycle set).
    """
    from mpc_for_av_at_intersection_tpu.models import prius_geometry

    ref = _load_ref_pickles(REF_PKL_PRIUS)
    assert set(ref.keys()) == set(primitive_table(prius_geometry()).names)

    for name, mp in ref.items():
        pts = np.asarray(mp.points, np.float64)
        arc = float(np.linalg.norm(np.diff(pts[:, :2], axis=0), axis=1).sum())
        # (a) stale length field: computed pre-scale-up, so ~0.3x the
        # points' arc (exact 0.3 for the straight arc; the later
        # object-space rear-wheel shift perturbs curved arcs slightly, and
        # heavily for the stalled wiggling ones). Never self-consistent.
        assert mp.total_length < 0.6 * arc, name
        if name in ("straight", "left1", "left2", "right1", "right2"):
            assert mp.total_length == pytest.approx(0.3 * arc, rel=5e-3), name
        # all pickles start at the rear-wheel-shifted origin x=-2.0
        assert pts[0, 0] == pytest.approx(-2.0, abs=1e-9), name

    # (b) stalled high-steer episodes
    def arc_of(n):
        p = np.asarray(ref[n].points, np.float64)
        return float(np.linalg.norm(np.diff(p[:, :2], axis=0), axis=1).sum())

    assert arc_of("left4") < 0.25 and arc_of("right4") < 0.25
    assert np.asarray(ref["left4"].points)[-1, 0] < -1.9   # ends behind start
    assert np.asarray(ref["right4"].points)[-1, 0] < -1.9
    assert arc_of("left3") < 3.7 and arc_of("right3") < 3.3

    # (c) the healthy straight episode still spans ~8.4 m vs kinematic 4.98
    table = primitive_table(prius_geometry())
    i = table.names.index("straight")
    assert arc_of("straight") == pytest.approx(8.44, abs=0.05)
    assert table.lengths[i] == pytest.approx(4.98, abs=0.01)


# --- generic A* contract (the reference test strategy, SURVEY section 4) ---

_GRAPH = {
    "a": [(2.0, "b"), (9.0, "e")],
    "b": [(4.0, "c"), (3.0, "d")],
    "c": [(1.0, "goal")],
    "d": [(6.0, "goal"), (0.5, "c")],
    "e": [(1.0, "goal")],
}


def test_astar_dijkstra_on_fixed_graph():
    astar = AStar(lambda n: _GRAPH.get(n, []))
    cost, path = astar.run("a", lambda n: n == "goal", lambda n: 0.0, debug=True)
    assert cost == 6.5
    assert path == ["a", "b", "d", "c", "goal"]
    # expansion order is part of the contract (zero heuristic -> Dijkstra)
    order = [e.node for e in astar.debug_data]
    assert order == ["a", "b", "d", "c", "goal"]


def test_astar_raises_when_unreachable():
    astar = AStar(lambda n: [])
    with pytest.raises(NoPathError):
        astar.run(0, lambda n: n == 1, lambda n: 0.0)


def test_astar_infinite_grid_heuristic_pruning():
    """Lazy infinite-graph expansion; better heuristics expand fewer nodes."""

    def neighbors(n):
        x, y = n
        for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            yield 1.0, (x + dx, y + dy)

    goal = (7, 3)

    def run_with(h):
        astar = AStar(neighbors)
        cost, path = astar.run((0, 0), lambda n: n == goal, h, debug=True)
        assert cost == 10.0
        return len(astar.debug_data)

    n_dijkstra = run_with(lambda n: 0.0)
    n_euclid = run_with(lambda n: math.hypot(n[0] - goal[0], n[1] - goal[1]))
    n_manhattan = run_with(lambda n: abs(n[0] - goal[0]) + abs(n[1] - goal[1]))
    assert n_manhattan < n_euclid < n_dijkstra


# --- full search parity on the flagship scenario ---------------------------

def _ref_search(scenario_kwargs, mps):
    from oracles.ref_loader import add_reference_paths, stub_motion_primitive_module

    add_reference_paths()
    stub_motion_primitive_module()
    from main.lib.motion_primitive_search_modified import (
        MotionPrimitiveSearch as RefSearch,
    )
    from lib.car_dimensions import BicycleModelDimensions
    from envs.intersection import intersection as ref_intersection

    car = BicycleModelDimensions(skip_back_circle_collision_checking=False)
    sc = ref_intersection(**scenario_kwargs)
    search = RefSearch(sc, car, mps, margin=car.radius)
    return search.run(debug=False)


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
@pytest.mark.parametrize(
    "kwargs",
    [
        dict(start_pos=4, turn_indicator=1),   # the flagship driver config
        dict(start_pos=1, turn_indicator=2),
        dict(start_pos=2, turn_indicator=3),
    ],
)
def test_search_parity_with_reference(kwargs):
    geom = bicycle_geometry()
    table = primitive_table(geom)

    # hand the reference search OUR primitive table so both searches see
    # bit-identical data (duck-typed stand-in: the search only reads
    # .points and .total_length; the reference's own MotionPrimitive
    # dataclass fails to import under py3.12 — mutable ndarray default)
    mps = {}
    for i, name in enumerate(table.names):
        mp = _MPStub()
        mp.name = name
        mp.points = table.points[i]
        mp.total_length = float(table.lengths[i])
        mps[name] = mp

    ref_cost, ref_path, ref_traj = _ref_search(kwargs, mps)

    ours = MotionPrimitiveSearch(
        intersection(**kwargs), geom, table, margin=geom.radius,
        weights=SearchWeights.modified(),
    )
    cost, path, traj = ours.run()

    assert cost == pytest.approx(ref_cost, abs=1e-9)
    assert len(path) == len(ref_path)
    np.testing.assert_allclose(np.asarray(path), np.asarray(ref_path), atol=1e-9)
    assert traj.shape == ref_traj.shape
    np.testing.assert_allclose(traj, ref_traj, atol=1e-9)


def test_grid_astar_demo_toy():
    """Headless twin of the reference's tkinter grid-A* toy
    (planner/A_star_naive.py): 8-connected unit-cost moves, Manhattan
    heuristic. Unit diagonal cost means path length == Chebyshev distance
    + 1 on an empty board; a wall forces a detour around its end."""
    from mpc_for_av_at_intersection_tpu.lattice.astar import NoPathError
    from mpc_for_av_at_intersection_tpu.utils.grid_astar_demo import grid_astar

    # empty board: optimal 8-connected unit-cost path
    path, explored = grid_astar((0, 0), (5, 9))
    assert len(path) == max(5, 9) + 1
    assert path[0] == (0, 0) and path[-1] == (5, 9)
    assert len(explored) >= len(path)

    # wall with one gap: path must pass through the gap
    wall = [(r, 5) for r in range(0, 25) if r != 24]
    path2, _ = grid_astar((10, 2), (10, 8), wall)
    assert (24, 5) in path2 or any(c == 5 and r == 24 for r, c in path2)

    # fully walled off -> NoPathError (the GUI just stalls)
    box = [(0, 1), (1, 1), (1, 0)]
    import pytest as _pytest
    with _pytest.raises(NoPathError):
        grid_astar((0, 0), (20, 20), box)
