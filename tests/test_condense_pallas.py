"""Fused rollout+linearize+condense Pallas kernel vs the XLA oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mpc_for_av_at_intersection_tpu.core.dynamics import SimLimits, plant_rollout
from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
from mpc_for_av_at_intersection_tpu.mpc import MPCConfig
from mpc_for_av_at_intersection_tpu.mpc.condense import condense
from mpc_for_av_at_intersection_tpu.mpc.linearize import linearize_bicycle
from mpc_for_av_at_intersection_tpu.ops.condense_pallas import build_qp_pallas


@pytest.mark.parametrize("T", [13, 20])
def test_condense_kernel_matches_xla(T):
    geom = bicycle_geometry()
    cfg = MPCConfig(T=T)
    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)
    rng = np.random.default_rng(0)
    B = 130                      # forces lane padding
    f = jnp.float32
    states = jnp.asarray(rng.normal(0, 3, (B, 4)), f)
    states = states.at[:, 2].set(jnp.asarray(rng.uniform(0, 8, B), f))
    oa = jnp.asarray(rng.normal(0, 1, (B, T)), f)
    od = jnp.asarray(rng.normal(0, 0.2, (B, T)), f)
    xref = jnp.asarray(rng.normal(0, 3, (B, 4, T + 1)), f)
    re = jnp.asarray(rng.random((B, T + 1)) < 0.3)

    controls = jnp.stack([oa, od], axis=-1)
    xbar = jax.vmap(
        lambda s, u: plant_rollout(s, u, cfg.dt, geom.wheelbase, limits)
    )(states, controls)
    dref = jnp.zeros((B, T), f)
    A, B_, C = jax.vmap(
        lambda v, p, d: linearize_bicycle(v, p, d, cfg.dt, geom.wheelbase)
    )(xbar[:, :-1, 2], xbar[:, :-1, 3], dref)
    ref = jax.vmap(
        lambda a, b, c, s, r, e: condense(a, b, c, s, r, e, cfg)
    )(A, B_, C, states, xref, re)

    got = build_qp_pallas(states, oa, od, xref, re, cfg, geom.wheelbase,
                          interpret=True)
    for name in ("P", "q", "G", "lo", "hi", "F", "g"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(b, a, atol=2e-6 * scale,
                                   err_msg=f"field {name}")
