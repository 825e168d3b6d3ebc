"""Fused Pallas collision kernel vs the XLA broadcast path (oracle).

Runs the kernel in interpret mode on CPU: exact same program as on TPU,
minus the Mosaic compiler. Covers the raw kernel (single + vmapped) and the
full wavefront search end-to-end with `collision="pallas_interpret"`.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.lattice import primitive_table
from mpc_for_av_at_intersection_tpu.lattice.wavefront import (
    WavefrontConfig,
    prepare_primitives,
    wavefront_search,
)
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.ops.collision_pallas import (
    frontier_collision,
    pack_collision,
)
from mpc_for_av_at_intersection_tpu.worlds import (
    compile_scenario,
    intersection,
    t_intersection,
)


def _setup(scenario):
    geom = bicycle_geometry()
    table = primitive_table(geom)
    prims = prepare_primitives(table, geom)
    arr = compile_scenario(scenario, margin=geom.radius)
    hp = jnp.asarray(arr.halfplanes, jnp.float32)
    ov = jnp.asarray(arr.obstacle_valid)
    return geom, prims, arr, hp, ov


def _collide_xla(ep, prims, hp, obstacle_valid):
    c, s = jnp.cos(ep[:, 2]), jnp.sin(ep[:, 2])
    wx = (ep[:, None, None, 0] + c[:, None, None] * prims.cc[None, :, :, 0]
          - s[:, None, None] * prims.cc[None, :, :, 1])
    wy = (ep[:, None, None, 1] + s[:, None, None] * prims.cc[None, :, :, 0]
          + c[:, None, None] * prims.cc[None, :, :, 1])
    vals = (wx[:, :, :, None, None] * hp[None, None, None, :, :, 0]
            + wy[:, :, :, None, None] * hp[None, None, None, :, :, 1]
            + hp[None, None, None, :, :, 2])
    inside = jnp.all(vals <= 0.0, axis=-1)
    pt_valid = prims.cc_mask[None, :, :, None]
    return jnp.any(inside & pt_valid & obstacle_valid[None, None, None, :],
                   axis=(2, 3))


def _frontier_poses(arr, n, seed=0):
    rng = np.random.default_rng(seed)
    base = np.asarray(arr.start, np.float32)
    ep = np.tile(base, (n, 1))
    ep[:, 0] += rng.uniform(-20, 20, n)
    ep[:, 1] += rng.uniform(-20, 20, n)
    ep[:, 2] = rng.uniform(-np.pi, np.pi, n)
    return jnp.asarray(ep, jnp.float32)


@pytest.mark.parametrize("sc", [
    intersection(turn_indicator=1, start_pos=4),
    t_intersection(turn_indicator=2, start_pos=4),
])
def test_kernel_matches_xla_broadcast(sc):
    geom, prims, arr, hp, ov = _setup(sc)
    ep = _frontier_poses(arr, 64)
    packed = pack_collision(prims.cc, prims.cc_mask, hp, ov)
    got = frontier_collision(ep, packed, interpret=True)
    want = _collide_xla(ep, prims, hp, ov)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # sanity: the random frontier must produce a mix of hits and misses
    assert 0 < int(np.asarray(want).sum()) < want.size


def test_kernel_matches_under_vmap():
    scs = [
        intersection(turn_indicator=1, start_pos=4),
        intersection(turn_indicator=2, start_pos=1),
    ]
    geom = bicycle_geometry()
    table = primitive_table(geom)
    prims = prepare_primitives(table, geom)
    arrs = [compile_scenario(s, margin=geom.radius) for s in scs]
    hp = jnp.asarray(np.stack([a.halfplanes for a in arrs]), jnp.float32)
    ov = jnp.asarray(np.stack([a.obstacle_valid for a in arrs]))
    eps = jnp.stack([_frontier_poses(a, 32, seed=i) for i, a in enumerate(arrs)])

    def one(ep, h, o):
        packed = pack_collision(prims.cc, prims.cc_mask, h, o)
        return frontier_collision(ep, packed, interpret=True)

    got = jax.vmap(one)(eps, hp, ov)
    want = jax.vmap(lambda ep, h, o: _collide_xla(ep, prims, h, o))(eps, hp, ov)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_wavefront_search_pallas_collision_end_to_end():
    sc = intersection(turn_indicator=1, start_pos=4)
    geom, prims, arr, hp, ov = _setup(sc)
    cfg = WavefrontConfig()
    args = (
        hp, ov,
        jnp.asarray(arr.start, jnp.float32),
        jnp.asarray(arr.goal_point, jnp.float32),
        jnp.asarray(arr.goal_area_corners, jnp.float32),
        jnp.asarray(arr.goal_theta_tol, jnp.float32),
    )
    res_x = jax.jit(
        lambda *a: wavefront_search(*a, prims, cfg, collision="xla")
    )(*args)
    res_p = jax.jit(
        lambda *a: wavefront_search(*a, prims, cfg, collision="pallas_interpret")
    )(*args)
    assert bool(res_p.found)
    # identical collision masks => identical search evolution
    np.testing.assert_allclose(float(res_p.cost), float(res_x.cost), rtol=1e-6)
    assert int(res_p.n_edges) == int(res_x.n_edges)
    np.testing.assert_allclose(
        np.asarray(res_p.trajectory), np.asarray(res_x.trajectory), atol=1e-5
    )
