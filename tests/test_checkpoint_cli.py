"""Checkpoint/resume + CLI smoke tests."""

import json
import subprocess
import sys

import numpy as np
import pytest

import jax

from mpc_for_av_at_intersection_tpu import api
from mpc_for_av_at_intersection_tpu.engine import run_episode
from mpc_for_av_at_intersection_tpu.utils.checkpoint import (
    load_state,
    run_chunked,
    save_state,
)


def test_checkpoint_roundtrip(tmp_path):
    setup = api.build_intersection(other_vehicles=False, n_steps=64)
    p = tmp_path / "state.npz"
    save_state(p, setup.state0)
    restored = load_state(p, setup.state0)
    for a, b in zip(
        jax.tree_util.tree_leaves(setup.state0), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_run_chunked_resume_matches_straight_run(tmp_path):
    setup = api.build_intersection(other_vehicles=False, n_steps=64)
    run = jax.jit(
        lambda s, n: run_episode(setup.world, s, setup.cfg, setup.geom, n),
        static_argnums=1,
    )

    final_a, tel_a = run(setup.state0, 60)

    # chunked with a simulated interruption: run 2 chunks, "crash", resume
    ck = str(tmp_path / "ck.npz")
    step_many = lambda s, n: run(s, n)
    state_mid, _ = run_chunked(step_many, setup.state0, 40, 20, ckpt_path=ck)
    # resume from checkpoint for the remaining steps
    final_b, _ = run_chunked(step_many, setup.state0, 60, 20, ckpt_path=ck)

    np.testing.assert_allclose(
        np.asarray(final_a.ego), np.asarray(final_b.ego), atol=1e-5
    )
    assert int(final_b.tick) == 60


def test_cli_run_and_sweep(tmp_path):
    env = {"JAX_PLATFORMS": "cpu", "PYTHONPATH": "/root/repo", "PATH": "/usr/bin:/bin:/usr/local/bin"}
    out = subprocess.run(
        [sys.executable, "-m", "mpc_for_av_at_intersection_tpu", "run",
         "--driver", "multi_lane", "--steps", "150",
         "--save-telemetry", str(tmp_path / "tel.npz")],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    res = json.loads(out.stdout)
    assert res["done"] is True
    assert res["unsolved_ticks"] == 0
    assert (tmp_path / "tel.npz").exists()
