"""World-layer tests: obstacle half-planes + env geometry parity with the
reference env generators (imported read-only as data oracles)."""

import math
import os

import numpy as np
import pytest

from mpc_for_av_at_intersection_tpu.worlds import (
    BoxObstacle,
    CircleObstacle,
    arterial_multi_lanes,
    compile_scenario,
    free_area,
    intersection,
    intersection_multi_lanes,
    roundabout,
    roundabout_big,
    t_intersection,
)
from mpc_for_av_at_intersection_tpu.worlds.obstacles import check_collision

HAVE_REF = os.path.isdir("/root/reference/main/envs")


def test_box_halfplanes_and_distance():
    b = BoxObstacle(center=(1.0, 2.0), size=(2.0, 4.0))
    hp = b.halfplanes(margin=0.5)
    # inside point satisfies all rows
    assert check_collision(hp, np.array([[1.0, 2.0]]))
    # outside beyond margin fails
    assert not check_collision(hp, np.array([[3.0, 2.0]]))
    # inside the margin band collides
    assert check_collision(hp, np.array([[2.3, 2.0]]))
    assert b.distance_to_point((4.0, 2.0)) == pytest.approx(2.0)
    assert b.distance_to_point((1.0, 2.5)) == 0.0


def test_circle_halfplanes_octagon():
    c = CircleObstacle(center=(0.0, 0.0), radius=2.0)
    hp = c.halfplanes()
    assert hp.shape == (8, 3)
    assert check_collision(hp, np.array([[0.0, 0.0]]))
    assert check_collision(hp, np.array([[1.99, 0.0]]))
    assert not check_collision(hp, np.array([[2.9, 0.0]]))
    # octagon circumscribes: the diagonal direction sticks out to r*sqrt(2) bound
    assert c.distance_to_point((3.0, 0.0)) == pytest.approx(1.0)


def test_compile_scenario_padding():
    sc = intersection(turn_indicator=1, start_pos=4)
    arrs = compile_scenario(sc, margin=1.0, max_obstacles=32, max_halfplanes=8)
    assert arrs.halfplanes.shape == (32, 8, 3)
    n_real = len(sc.obstacles)
    assert arrs.obstacle_valid.sum() == n_real
    # padded obstacle slots can never contain any point
    pad = arrs.halfplanes[n_real]
    assert not check_collision(pad, np.random.default_rng(0).normal(size=(50, 2)) * 100)
    # padded halfplane rows of a real box obstacle don't change membership
    box_rows = arrs.halfplanes[0]
    inside_pt = np.array([[sc.obstacles[0].center[0], sc.obstacles[0].center[1]]])
    assert check_collision(box_rows, inside_pt)


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
@pytest.mark.parametrize(
    "ours_fn,ref_mod,kwargs",
    [
        (intersection, "intersection", dict(turn_indicator=1, start_pos=4)),
        (intersection, "intersection", dict(turn_indicator=2, start_pos=1)),
        (intersection, "intersection", dict(turn_indicator=3, start_pos=2)),
        (intersection, "intersection", dict(turn_indicator=1, start_pos=3)),
        (t_intersection, "t_intersection", dict(turn_indicator=1, start_pos=1)),
        (t_intersection, "t_intersection", dict(turn_indicator=3, start_pos=2)),
        (t_intersection, "t_intersection", dict(turn_indicator=2, start_pos=4)),
        (roundabout, "roundabout", dict(turn_indicator=1, start_pos=1)),
        (roundabout, "roundabout", dict(turn_indicator=4, start_pos=2)),
        (roundabout, "roundabout", dict(turn_indicator=2, start_pos=3)),
        (roundabout, "roundabout", dict(turn_indicator=3, start_pos=4)),
        (roundabout_big, "roundabout_big", dict(turn_indicator=1, start_pos=1)),
        (roundabout_big, "roundabout_big", dict(turn_indicator=4, start_pos=4)),
        (
            intersection_multi_lanes,
            "intersection_multi_lanes",
            dict(turn_indicator=1, start_pos=1, start_lane=2, goal_lane=1, number_of_lanes=2),
        ),
        (
            intersection_multi_lanes,
            "intersection_multi_lanes",
            dict(turn_indicator=3, start_pos=4, start_lane=1, goal_lane=3, number_of_lanes=3),
        ),
        (
            intersection_multi_lanes,
            "intersection_multi_lanes",
            dict(turn_indicator=2, start_pos=2, start_lane=1, goal_lane=1, number_of_lanes=1),
        ),
    ],
)
def test_env_parity_with_reference(ours_fn, ref_mod, kwargs):
    from oracles.ref_loader import load_ref_env, scenario_signature

    mod = load_ref_env(ref_mod)
    ref_fn = getattr(mod, "roundabout", None) or getattr(mod, ref_mod, None)
    if ref_fn is None:
        ref_fn = getattr(mod, "intersection", None) or getattr(mod, "t_intersection")
    ref_sc = ref_fn(**kwargs)
    ours_sc = ours_fn(**kwargs)

    for margin in (0.0, 1.4142135623730951):
        sig_ref = scenario_signature(ref_sc, margin=margin)
        sig_ours = scenario_signature(ours_sc, margin=margin)
        assert sig_ours == sig_ref, f"{ref_mod} {kwargs} margin={margin}"


@pytest.mark.skipif(not HAVE_REF, reason="reference tree unavailable")
def test_arterial_parity_with_reference():
    from oracles.ref_loader import add_reference_paths, scenario_signature

    add_reference_paths()
    from envs.arterial_multi_lanes import ArterialMultiLanes

    for num_lanes, goal_lane in [(2, 1), (4, 4), (3, 2), (1, 1)]:
        ref_sc = ArterialMultiLanes(num_lanes=num_lanes, goal_lane=goal_lane).create_scenario()
        ours_sc = arterial_multi_lanes(num_lanes=num_lanes, goal_lane=goal_lane)
        assert scenario_signature(ours_sc) == scenario_signature(ref_sc)


def test_free_area_semantics():
    sc = free_area(test_no=1, angle=math.pi / 4, start_pos=1.0, goal_distance=10.0)
    assert sc.obstacles == []
    assert sc.start == (1.0, 1.0, 0.0)
    np.testing.assert_allclose(
        sc.goal_point,
        (1.0 + 10.0 * math.cos(math.pi / 4), 1.0 + 10.0 * math.sin(math.pi / 4), math.pi / 4),
    )
    sc2 = free_area(test_no=2, angle=1.0)
    assert sc2.goal_point[2] == 0.0
