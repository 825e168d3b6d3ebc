"""Native C++ lattice search vs the Python oracle: exact parity + speed."""

import time

import numpy as np
import pytest

from mpc_for_av_at_intersection_tpu.lattice import (
    MotionPrimitiveSearch,
    SearchWeights,
    primitive_table,
)
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.native import (
    NativeMotionPrimitiveSearch,
    native_available,
)
from mpc_for_av_at_intersection_tpu.worlds import intersection, roundabout, t_intersection

pytestmark = pytest.mark.skipif(not native_available(), reason="no g++ toolchain")


@pytest.mark.parametrize(
    "scenario,weights",
    [
        (intersection(turn_indicator=1, start_pos=4), SearchWeights.modified()),
        (intersection(turn_indicator=2, start_pos=1), SearchWeights.modified()),
        (intersection(turn_indicator=3, start_pos=2), SearchWeights.multi_lane()),
        (t_intersection(turn_indicator=1, start_pos=1), SearchWeights.base()),
        (roundabout(turn_indicator=1, start_pos=1), SearchWeights.roundabout()),
    ],
)
def test_native_matches_python_search(scenario, weights):
    geom = bicycle_geometry()
    table = primitive_table(geom)

    py = MotionPrimitiveSearch(scenario, geom, table, margin=geom.radius, weights=weights)
    cost_py, path_py, traj_py = py.run()

    nat = NativeMotionPrimitiveSearch(
        scenario, geom, table, margin=geom.radius, weights=weights
    )
    cost_nat, path_nat, traj_nat = nat.run()

    assert cost_nat == pytest.approx(cost_py, abs=1e-9)
    assert len(path_nat) == len(path_py)
    np.testing.assert_allclose(np.asarray(path_nat), np.asarray(path_py), atol=1e-9)
    np.testing.assert_allclose(traj_nat, traj_py, atol=1e-9)


def test_native_speedup():
    geom = bicycle_geometry()
    table = primitive_table(geom)
    scenario = intersection(turn_indicator=1, start_pos=4)

    nat = NativeMotionPrimitiveSearch(
        scenario, geom, table, margin=geom.radius
    )
    nat.run()  # warm
    t0 = time.perf_counter()
    for _ in range(3):
        nat.run()
    t_nat = (time.perf_counter() - t0) / 3

    py = MotionPrimitiveSearch(scenario, geom, table, margin=geom.radius)
    t0 = time.perf_counter()
    cost, _, _ = py.run()
    t_py = time.perf_counter() - t0

    print(f"native {t_nat*1e3:.1f} ms vs python {t_py*1e3:.1f} ms")
    assert t_nat < t_py / 5, f"native {t_nat:.4f}s vs python {t_py:.4f}s"


def test_native_no_path():
    from mpc_for_av_at_intersection_tpu.lattice.astar import NoPathError

    geom = bicycle_geometry()
    table = primitive_table(geom)
    scenario = roundabout(turn_indicator=4, start_pos=1)  # infeasible upstream config
    nat = NativeMotionPrimitiveSearch(scenario, geom, table, margin=geom.radius)
    with pytest.raises(NoPathError):
        nat.run()
