"""Scaling + latency report: solves/s at 1 chip .. N devices, p50 tick latency.

Complements bench.py (single-chip headline) with the BASELINE.md reporting
requirements: scaling efficiency across the available mesh (run under a
multi-chip slice to get 1-chip / 1-host / multi-host rows — this
environment exposes one physical chip, so extra rows come from the virtual
CPU mesh when present) and the p50 single-scenario control-step latency
against the 0.2 s real-time budget.

Prints one JSON object (not the driver's one-line bench contract —
bench.py remains the headline).
"""

import json
import time

import numpy as np


def _mk_instances(B, N_COURSE, HORIZON, dtype):
    import jax.numpy as jnp

    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy

    rng = np.random.default_rng(0)
    dl = 0.083
    turn = rng.normal(0.0, 0.01, size=(B, N_COURSE)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(B):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 40, size=B)
    state = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0.0, 8.0, B), course[np.arange(B), i0, 2]], axis=1
    )
    return (jnp.asarray(state, dtype), jnp.asarray(course, dtype),
            jnp.zeros((B, N_COURSE), dtype), jnp.full((B,), N_COURSE, jnp.int32),
            jnp.full((B,), dl, dtype))


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import MPCConfig, init_controller_state, mpc_step
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched
    from mpc_for_av_at_intersection_tpu.parallel import batch_mesh

    geom = bicycle_geometry()
    cfg = MPCConfig(T=20)
    dtype = jnp.float32
    use_pallas = jax.default_backend() == "tpu"
    devices = jax.devices()
    report = {"device": str(devices[0]), "n_devices": len(devices)}

    # --- p50 single-scenario control-step latency (batch = 1) ---
    args1 = _mk_instances(1, 512, 20, dtype)
    cs1 = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (1,) + x.shape), init_controller_state(cfg, dtype)
    )
    step1 = jax.jit(
        lambda s, c, v, n, d, k: jax.vmap(
            lambda *a: mpc_step(*a, cfg, geom.wheelbase)
        )(s, c, v, n, d, k)
    )
    from mpc_for_av_at_intersection_tpu.utils.benchtime import (
        fetch_scalar,
        measure_fetch_cost,
        time_chained,
    )

    out = step1(*args1, cs1)
    fetch_scalar(out.accel)
    # single-step latency: chain steps through the controller state so each
    # dispatch depends on the previous (block_until_ready can lie through a
    # remote-TPU tunnel; the terminal fetch in time_chained cannot). A long
    # chain amortizes tunnel fetch-latency noise to <1 ms/step; a batch-1
    # step is far cheaper than one tunnel round-trip, so short chains can
    # even go negative after the fetch-cost subtraction.
    s1, c1, v1, n1, d1 = args1
    dt1, _ = time_chained(lambda k: step1(s1, c1, v1, n1, d1, k.state), out, 200)
    report["p50_single_step_latency_ms"] = round(max(dt1, 0.0) * 1e3, 2)
    report["realtime_budget_ms"] = 200.0

    # --- throughput scaling over device counts ---
    rows = []
    B_per_dev = 2048 if use_pallas else 64  # CPU mesh: keep it tractable
    for nd in sorted({1, len(devices)}):
        B = B_per_dev * nd
        args = _mk_instances(B, 512, 20, dtype)
        cs = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (B,) + x.shape), init_controller_state(cfg, dtype)
        )
        if nd > 1:
            mesh = batch_mesh(devices[:nd])
            sharding = NamedSharding(mesh, P("batch"))
            args = tuple(jax.device_put(a, sharding) for a in args)
            cs = jax.tree.map(lambda a: jax.device_put(a, sharding), cs)

        stepB = jax.jit(
            lambda s, c, v, n, d, k: mpc_step_batched(
                s, c, v, n, d, k, cfg, geom.wheelbase, use_pallas=use_pallas
            )
        )
        out = stepB(*args, cs)
        fetch_scalar(out.accel)
        s_, c_, v_, n_, d_ = args
        dt, _ = time_chained(lambda k: stepB(s_, c_, v_, n_, d_, k.state), out, 5)
        rows.append({
            "devices": nd,
            "batch": B,
            "solves_per_sec": round(B / dt, 1),
            "solves_per_sec_per_device": round(B / dt / nd, 1),
        })
    if len(rows) == 2:
        rows[1]["scaling_efficiency"] = round(
            rows[1]["solves_per_sec_per_device"] / rows[0]["solves_per_sec_per_device"], 3
        )
    report["scaling"] = rows

    # --- max real-time batch: largest fleet whose full solve tick stays
    # under the 0.2 s control budget on one device ---
    if use_pallas:
        rt_rows = []
        for B in (1024, 2048, 3072, 3584, 4096):
            args = _mk_instances(B, 512, 20, dtype)
            cs = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape),
                init_controller_state(cfg, dtype),
            )
            stepB = jax.jit(
                lambda s, c, v, n, d, k: mpc_step_batched(
                    s, c, v, n, d, k, cfg, geom.wheelbase, use_pallas=use_pallas
                )
            )
            out = stepB(*args, cs)
            fetch_scalar(out.accel)
            s_, c_, v_, n_, d_ = args
            dt, _ = time_chained(lambda k: stepB(s_, c_, v_, n_, d_, k.state), out, 5)
            ms = dt * 1e3
            rt_rows.append({"batch": B, "tick_ms": round(ms, 1),
                            "realtime": ms < 200.0})
        report["realtime_batch_sweep"] = rt_rows
        ok = [r["batch"] for r in rt_rows if r["realtime"]]
        report["max_realtime_batch_per_chip"] = max(ok) if ok else 0

    if jax.default_backend() == "cpu":
        report["note"] = (
            "virtual CPU devices share physical cores; efficiency numbers "
            "are only meaningful on a real multi-chip slice"
        )
    out_js = json.dumps(report, indent=2)
    print(out_js)
    import sys

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(out_js + "\n")


if __name__ == "__main__":
    main()
