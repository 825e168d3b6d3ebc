"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from mpc_for_av_at_intersection_tpu.parallel import batch_mesh


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_entrypoint():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_batched_episodes_sharded_equals_vmap():
    """shard_map over the batch axis must agree with plain vmap."""
    import __graft_entry__ as ge
    from mpc_for_av_at_intersection_tpu.agents import (
        make_t_intersection_agent,
        stack_agents,
    )
    from mpc_for_av_at_intersection_tpu.engine import (
        EngineConfig,
        init_engine_state,
        make_world,
    )
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import MPCConfig
    from mpc_for_av_at_intersection_tpu.parallel import (
        run_batch_episodes,
        stack_states,
        stack_worlds,
    )

    cfg = EngineConfig(
        mpc=MPCConfig(admm_rounds=2, admm_iters=8),
        n_traj=64, n_frames=48, n_agents=2, frame_window=4,
    )
    geom = bicycle_geometry()
    t = np.linspace(0.0, 6.0, 60)
    course = np.stack([t, 0.02 * t ** 2, 0.0 * t], axis=1)
    course[:, 2] = np.arctan2(np.gradient(course[:, 1]), np.gradient(course[:, 0]))

    worlds, states = [], []
    for i in range(8):
        rows = [make_t_intersection_agent(direction=1, turning=False, speed=4.0 + i * 0.2, offset=1.0)]
        params, ag = stack_agents(rows, n_slots=cfg.n_agents)
        w = make_world(course, params, cfg)
        worlds.append(w)
        states.append(init_engine_state(w, ag, cfg, 3))

    wb, sb = stack_worlds(worlds), stack_states(states)

    f1, t1, s1 = run_batch_episodes(wb, sb, cfg, geom, 3, mesh=None)
    f2, t2, s2 = run_batch_episodes(wb, sb, cfg, geom, 3, mesh=batch_mesh())

    np.testing.assert_allclose(np.asarray(f1.ego), np.asarray(f2.ego), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t1.steer), np.asarray(t2.steer), atol=1e-6)
    assert int(s1["n_done"]) == int(s2["n_done"])
    assert int(s2["n_unsolved_ticks"]) == int(s1["n_unsolved_ticks"])
