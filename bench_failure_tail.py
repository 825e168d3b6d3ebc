"""Solver failure tail: unsolved-tick rate over a large TPU f32 fleet run.

Round-1 observed ~1/25,600 fleet ticks unsolved (controller brakes as
designed, QUIRKS #16); the primal-identified second polish attempt
(mpc/qp.py) was added to kill that tail. This measures the post-fix rate
over >= 100k closed-loop fleet ticks (VERDICT round-1 item 5).

Prints one JSON object; pass a path argument to persist it.
"""

import json
import sys
import time

import numpy as np

N_SCENARIOS = 1024
N_STEPS = 128          # 1024 x 128 = 131,072 fleet ticks


def main():
    import pathlib

    import jax

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from mpc_for_av_at_intersection_tpu import api
    from mpc_for_av_at_intersection_tpu.engine import EngineConfig
    from mpc_for_av_at_intersection_tpu.parallel import (
        run_batch_episodes,
        stack_states,
        stack_worlds,
    )

    rng = np.random.default_rng(42)
    t0 = time.time()
    geom, worlds, states, meta = api.sample_intersection_fleet(
        N_SCENARIOS, rng, n_steps=N_STEPS
    )
    t_build = time.time() - t0
    wb, sb = stack_worlds(worlds), stack_states(states)

    fast = jax.default_backend() == "tpu"
    # warm run (compile + the 1-10 min server-side first-exec tax through
    # the tunnel, NOTES.md); the timed bracket below measures steady state —
    # round-3's artifact bracketed the first execution and published an 84x
    # misleading ticks/s (VERDICT r3 weak #3)
    t0 = time.time()
    final, tel, summary = run_batch_episodes(
        wb, sb, EngineConfig(), geom, N_STEPS, fast=fast,
    )
    # int() is a real value fetch: block_until_ready can return early
    # through the remote-TPU tunnel, so the fetch must be inside the bracket
    n_unsolved = int(summary["n_unsolved_ticks"])
    t_first = time.time() - t0

    t0 = time.time()
    final, tel, summary = run_batch_episodes(
        wb, sb, EngineConfig(), geom, N_STEPS, fast=fast,
    )
    n_unsolved = int(summary["n_unsolved_ticks"])
    t_run = time.time() - t0

    n_ticks = N_SCENARIOS * N_STEPS
    report = {
        "metric": "unsolved_tick_rate",
        "fleet_ticks": n_ticks,
        "unsolved_ticks": n_unsolved,
        "rate": n_unsolved / n_ticks,
        "n_scenarios": N_SCENARIOS,
        "n_done": int(summary["n_done"]),
        "build_s": round(t_build, 1),
        "first_run_s": round(t_first, 1),
        "run_s": round(t_run, 1),
        "scenario_ticks_per_s": round(n_ticks / t_run, 1),
        "device": str(jax.devices()[0]),
        "dtype": "float32",
    }
    out = json.dumps(report, indent=2)
    print(out)
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
