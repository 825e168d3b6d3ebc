"""Per-stage device profile of the bench steady state (PROFILE.md source).

``jax.profiler`` traces do not come back through the axon remote-TPU
tunnel, so the time split is measured directly: each pipeline stage runs as
a jitted ``lax.scan`` of K dependent repetitions (the scan carry forces
serialization; one dispatch + one terminal fetch amortizes the tunnel), and
wall/K gives that stage's device time. Stages sum to ~the full controller
tick, which is measured the same way as a cross-check.

Stages (mpc/batch.py pipeline at B=4096, T=20, n=2T=40, m=4T-1=79; round-4
lanes-resident structure — the production tick is reference -> condense
kernel -> ruiz_admm kernel -> polish kernel -> epilogue):
  reference     velocity-lookahead reference indexing (vmap compute_reference)
  condense_k    fused rollout + linearize + condense Pallas kernel
  ruiz_admm     ONE Pallas launch: in-kernel Ruiz + all rounds'
                factorization (lanes Cholesky + explicit inverse),
                170 iterations/round, residuals, in-kernel rho rule
  polish        ONE Pallas launch: two-attempt active-set polish + select
  (lin_cond / ruiz / factor_1round / admm_1round / resid_1round are the
  replaced XLA stages, kept as micro-probes for comparison; admm_all is
  the round-4a kernel without in-kernel Ruiz)

Prints one JSON object; pass a path to persist (the PROFILE_r0N.json
artifact).
"""

import json
import pathlib
import statistics
import sys
import time

import numpy as np

import os

BATCH = int(os.environ.get("PROFILE_BATCH", 4096))
N_COURSE = 512
HORIZON = 20


def main():
    import jax

    cache_dir = pathlib.Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from mpc_for_av_at_intersection_tpu.core.dynamics import SimLimits, plant_rollout
    from mpc_for_av_at_intersection_tpu.models import bicycle_geometry
    from mpc_for_av_at_intersection_tpu.mpc import MPCConfig, init_controller_state
    from mpc_for_av_at_intersection_tpu.mpc.batch import mpc_step_batched
    from mpc_for_av_at_intersection_tpu.mpc.condense import condense
    from mpc_for_av_at_intersection_tpu.mpc.linearize import linearize_bicycle
    from mpc_for_av_at_intersection_tpu.mpc.qp import (
        _polish_and_select,
        _ruiz_equilibrate,
        solve_box_qp_batched,
    )
    from mpc_for_av_at_intersection_tpu.mpc.reference import compute_reference
    from mpc_for_av_at_intersection_tpu.ops.admm_pallas import admm_iterations_pallas
    from mpc_for_av_at_intersection_tpu.utils.benchtime import fetch_scalar

    geom = bicycle_geometry()
    cfg = MPCConfig(T=HORIZON)
    dtype = jnp.float32
    B, T, n, m = BATCH, HORIZON, 2 * HORIZON, 4 * HORIZON - 1
    use_pallas = jax.default_backend() == "tpu"
    limits = SimLimits(max_steer=cfg.max_steer, max_speed=cfg.max_speed,
                       min_speed=cfg.min_speed)

    rng = np.random.default_rng(0)
    from mpc_for_av_at_intersection_tpu.core.angles import smooth_yaw_numpy

    dl = 0.083
    turn = rng.normal(0.0, 0.01, size=(B, N_COURSE)).cumsum(axis=1)
    yaw = rng.uniform(-np.pi, np.pi, size=(B, 1)) + turn
    xy = np.cumsum(np.stack([np.cos(yaw), np.sin(yaw)], axis=-1) * dl, axis=1)
    course = np.concatenate([xy, yaw[..., None]], axis=-1)
    for b in range(0, B, 64):
        course[b, :, 2] = smooth_yaw_numpy(course[b, :, 2])
    i0 = rng.integers(3, 40, size=B)
    state = np.stack(
        [course[np.arange(B), i0, 0], course[np.arange(B), i0, 1],
         rng.uniform(0.0, 8.0, B), course[np.arange(B), i0, 2]], axis=1)

    states = jnp.asarray(state, dtype)
    courses = jnp.asarray(course, dtype)
    cv = jnp.zeros((B, N_COURSE), dtype)
    valid_len = jnp.full((B,), N_COURSE, jnp.int32)
    dls = jnp.full((B,), dl, dtype)
    cs = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (B,) + x.shape),
        init_controller_state(cfg, dtype),
    )

    K = 8          # chained reps inside each stage scan
    REPS = 5       # timed launches per stage (median reported)
    report = {"device": str(jax.devices()[0]), "batch": B, "T": T,
              "n": n, "m": m, "k_steps": K, "reps": REPS,
              "admm_rounds": cfg.admm_rounds, "admm_iters": cfg.admm_iters}
    eps = jnp.asarray(1e-30, dtype)

    def timed(name, fn, *args):
        """fn is already jitted and returns a small array; scan-chained
        externally by fn itself (each fn embeds a K-rep lax.scan)."""
        out = fn(*args)
        fetch_scalar(jax.tree.leaves(out)[0])       # compile + warm
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            out = fn(*args)
            fetch_scalar(jax.tree.leaves(out)[0])
            ts.append((time.perf_counter() - t0) / K)
        ms = statistics.median(ts) * 1e3
        report[name + "_ms"] = round(ms, 3)
        print(f"{name:12s} {ms:9.3f} ms", file=sys.stderr, flush=True)
        return ms

    # ---- full controller tick (cross-check) ----
    @jax.jit
    def full_chain(s, c, v, nl, d, k0):
        def body(k, _):
            out = mpc_step_batched(s, c, v, nl, d, k, cfg, geom.wheelbase,
                                   use_pallas=use_pallas)
            return out.state, ()
        kf, _ = jax.lax.scan(body, k0, None, length=K)
        return kf.oa

    t_full = timed("full_tick", full_chain, states, courses, cv, valid_len, dls, cs)

    # ---- stage: reference ----
    @jax.jit
    def ref_chain(s, c, v, nl, d, ti0):
        def body(ti, _):
            xref, ti2, re = jax.vmap(
                lambda s_, c_, v_, n_, d_, t_: compute_reference(
                    s_, c_, v_, n_, d_, t_, jnp.zeros((T + 1,), dtype),
                    jnp.zeros((), bool), T, cfg.dt,
                    use_speed_channel=cfg.speed_ref)
            )(s, c, v, nl, d, ti)
            return ti2, ()
        tf, _ = jax.lax.scan(body, ti0, None, length=K)
        return tf

    t_ref = timed("reference", ref_chain, states, courses, cv, valid_len, dls,
                  cs.target_idx)

    # fixed linearization inputs for the solver stages
    controls0 = jnp.zeros((B, T, 2), dtype)

    @jax.jit
    def make_qp(s, u):
        xbar = jax.vmap(lambda a, b: plant_rollout(a, b, cfg.dt, geom.wheelbase,
                                                   limits))(s, u)
        dref = jnp.zeros((B, T), dtype)
        A, B_, C = jax.vmap(
            lambda v, p, d: linearize_bicycle(v, p, d, cfg.dt, geom.wheelbase,
                                              nx=cfg.nx)
        )(xbar[:, :-1, 2], xbar[:, :-1, 3], dref)
        xref = jnp.zeros((B, cfg.nx, T + 1), dtype)
        re = jnp.zeros((B, T + 1), bool)
        return jax.vmap(lambda a, b, c, s_, r, e: condense(a, b, c, s_, r, e, cfg))(
            A, B_, C, s, xref, re)

    cqp = make_qp(states, controls0)
    cqp = jax.tree.map(lambda x: x.block_until_ready(), cqp)

    # ---- stage: rollout + linearize + condense ----
    @jax.jit
    def lincond_chain(s, u0):
        def body(u, _):
            q_ = make_qp(s, u).q
            return u + eps * q_[:, : 2 * T].reshape(B, T, 2), ()
        uf, _ = jax.lax.scan(body, u0, None, length=K)
        return uf

    t_lc = timed("lin_cond", lincond_chain, states, controls0)

    # ---- stage: ruiz ----
    @jax.jit
    def ruiz_chain(P, q, G):
        def body(q_, _):
            d_, e_, c_ = jax.vmap(_ruiz_equilibrate)(P, q_, G)
            return q_ + eps * d_, ()
        qf, _ = jax.lax.scan(body, q, None, length=K)
        return qf

    t_ruiz = timed("ruiz", ruiz_chain, cqp.P, cqp.q, cqp.G)

    # scaled QP data for factor/admm stages
    import jax as _jax
    with _jax.default_matmul_precision("float32"):
        d_, e_, c_ = jax.jit(jax.vmap(_ruiz_equilibrate))(cqp.P, cqp.q, cqp.G)
        Ps = (c_[:, None, None] * d_[:, :, None]) * cqp.P * d_[:, None, :]
        qs = c_[:, None] * d_ * cqp.q
        Gs = e_[:, :, None] * cqp.G * d_[:, None, :]
        los = e_ * cqp.lo
        his = e_ * cqp.hi
    rho = jnp.full((B,), cfg.admm_rho, dtype)
    eye = jnp.eye(n, dtype=dtype)

    # ---- stage: factorization (per round; reported x rounds) ----
    @jax.jit
    def factor_chain(Ps_, Gs_, rho0):
        def body(r, _):
            with _jax.default_matmul_precision("float32"):
                GtG = jnp.einsum("bmn,bmk->bnk", Gs_, Gs_)
                M = Ps_ + cfg.admm_sigma * eye[None] + r[:, None, None] * GtG
                L = jnp.linalg.cholesky(M)
                Minv = _jax.scipy.linalg.cho_solve(
                    (L, True), jnp.broadcast_to(eye, (B, n, n)))
            return r + eps * Minv[:, 0, 0], ()
        rf, _ = jax.lax.scan(body, rho0, None, length=K)
        return rf

    t_factor1 = timed("factor_1round", factor_chain, Ps, Gs, rho)

    with _jax.default_matmul_precision("float32"):
        GtG = jnp.einsum("bmn,bmk->bnk", Gs, Gs)
        M = Ps + cfg.admm_sigma * eye[None] + rho[:, None, None] * GtG
        L = jnp.linalg.cholesky(M)
        Minv = _jax.scipy.linalg.cho_solve((L, True),
                                           jnp.broadcast_to(eye, (B, n, n)))
        Minv = Minv.block_until_ready()

    # ---- stage: the Pallas ADMM kernel, one round of 170 iters ----
    if use_pallas:
        x0 = jnp.zeros((B, n), dtype)
        z0 = jnp.zeros((B, m), dtype)
        y0 = jnp.zeros((B, m), dtype)

        @jax.jit
        def admm_chain(Minv_, Gs_, qs_, los_, his_, rho_, x, z, y):
            def body(carry, _):
                x_, z_, y_ = carry
                xn, zn, yn = admm_iterations_pallas(
                    Minv_, Gs_, qs_, los_, his_, rho_, x_, z_, y_,
                    cfg.admm_iters, cfg.admm_sigma, cfg.admm_alpha)
                return (xn, zn, yn), ()
            (xf, zf, yf), _ = jax.lax.scan(body, (x, z, y), None, length=K)
            return xf

        t_admm1 = timed("admm_1round", admm_chain, Minv, Gs, qs, los, his,
                        rho, x0, z0, y0)
    else:
        t_admm1 = 0.0
        report["admm_1round_ms"] = None   # pallas path needs the TPU backend

    # ---- stage: residuals + rho adaptation (per round) ----
    @jax.jit
    def resid_chain(Ps_, Gs_, qs_, x, z, y, rho0):
        def body(r, _):
            with _jax.default_matmul_precision("float32"):
                Gx = jnp.einsum("bmn,bn->bm", Gs_, x)
                prim = jnp.max(jnp.abs(Gx - z), axis=1)
                Px = jnp.einsum("bnk,bk->bn", Ps_, x)
                Gty = jnp.einsum("bmn,bm->bn", Gs_, y)
                dual = jnp.max(jnp.abs(Px + qs_ + Gty), axis=1)
            pr = prim / jnp.maximum(jnp.maximum(
                jnp.max(jnp.abs(Gx), axis=1), jnp.max(jnp.abs(z), axis=1)), 1e-6)
            dr = dual / jnp.maximum(jnp.maximum(
                jnp.max(jnp.abs(Px), axis=1), jnp.max(jnp.abs(qs_), axis=1)), 1e-6)
            return jnp.clip(r * jnp.sqrt((pr + 1e-12) / (dr + 1e-12)),
                            1e-6, 1e6), ()
        rf, _ = jax.lax.scan(body, rho0, None, length=K)
        return rf

    x_ = jnp.zeros((B, n), dtype)
    z_ = jnp.zeros((B, m), dtype)
    t_resid1 = timed("resid_1round", resid_chain, Ps, Gs, qs, x_, z_, z_, rho)

    # ---- stage: the fused all-rounds kernel (one launch, rho in-kernel) ----
    if use_pallas:
        from mpc_for_av_at_intersection_tpu.ops.admm_pallas import (
            admm_all_rounds_pallas,
            polish_select_pallas,
        )

        @jax.jit
        def admm_all_chain(Ps_, Gs_, qs_, los_, his_, rho_, x, z, y):
            def body(carry, _):
                x_, z_, y_ = carry
                xn, zn, yn, pr, du = admm_all_rounds_pallas(
                    Ps_, Gs_, qs_, los_, his_, rho_, x_, z_, y_,
                    cfg.admm_rounds, cfg.admm_iters, cfg.admm_sigma,
                    cfg.admm_alpha)
                return (xn, zn, yn), ()
            (xf, zf, yf), _ = jax.lax.scan(
                body, (x, z, y), None, length=K)
            return xf

        x0 = jnp.zeros((B, n), dtype)
        z0 = jnp.zeros((B, m), dtype)
        y0 = jnp.zeros((B, m), dtype)
        t_admm_all = timed("admm_all", admm_all_chain, Ps, Gs, qs, los, his,
                           rho, x0, z0, y0)

        # ---- stage: the Pallas polish kernel ----
        @jax.jit
        def polish_k_chain(P, q, G, lo, hi, x, y):
            def body(x_, _):
                xp, yp, ok, pr = polish_select_pallas(
                    P, q, G, lo, hi, x_, y, jnp.zeros((B,), dtype))
                return x_ + eps * xp, ()
            xf, _ = jax.lax.scan(body, x, None, length=K)
            return xf

        t_polish = timed("polish", polish_k_chain, cqp.P, cqp.q, cqp.G,
                         cqp.lo, cqp.hi, x_, z_)

        # ---- stage: the fused condense kernel ----
        from mpc_for_av_at_intersection_tpu.ops.condense_pallas import (
            build_qp_pallas,
        )

        oa0 = jnp.zeros((B, T), dtype)
        od0 = jnp.zeros((B, T), dtype)
        xref0 = jnp.zeros((B, 4, T + 1), dtype)
        re0 = jnp.zeros((B, T + 1), bool)

        @jax.jit
        def condense_k_chain(s, oa_):
            def body(o, _):
                out = build_qp_pallas(s, o, od0, xref0, re0, cfg,
                                      geom.wheelbase, lanes_out=True)
                probe = out.q_l.reshape(-1)[0]
                return o + eps * probe, ()
            of, _ = jax.lax.scan(body, oa_, None, length=K)
            return of

        t_cond = timed("condense_k", condense_k_chain, states, oa0)

        # ---- stage: the lanes ruiz+admm kernel ----
        from mpc_for_av_at_intersection_tpu.ops.admm_pallas import (
            ruiz_admm_all_rounds_pallas,
        )

        lq = jax.jit(
            lambda s, o: build_qp_pallas(s, o, od0, xref0, re0, cfg,
                                         geom.wheelbase, lanes_out=True)
        )(states, oa0)
        P_l = lq.P_l.block_until_ready()

        checks_n, check_iters, s_eps, s_band, s_cap, s_ratio = (
            cfg.solver_schedule)

        @jax.jit
        def ruiz_admm_chain(P_l_, G_l_, q_l_, lo_l_, hi_l_):
            Bt_ = q_l_.shape[0]
            Bfull = Bt_ * 128

            def body(carry, _):
                q_in, warm = carry
                x, y, pr, du, rho, chk = ruiz_admm_all_rounds_pallas(
                    P_l_, G_l_, q_in, lo_l_, hi_l_,
                    checks_n, check_iters, cfg.admm_rho,
                    cfg.admm_sigma, cfg.admm_alpha,
                    warm=warm, eps=s_eps, refactor_band=s_band,
                    stall_cap=s_cap, stall_ratio=s_ratio)
                xl = x.reshape(Bt_, 128, n).transpose(0, 2, 1)
                return (q_in + eps * xl, (x, y, rho)), chk

            warm0 = (jnp.zeros((Bfull, n), jnp.float32),
                     jnp.zeros((Bfull, m), jnp.float32),
                     jnp.full((Bfull,), cfg.admm_rho, jnp.float32))
            (qf, _), chks = jax.lax.scan(
                body, (q_l_, warm0), None, length=K)
            return qf, chks

        def ruiz_admm_run(*a):
            return ruiz_admm_chain(*a)[0]

        t_ruiz_admm = timed("ruiz_admm", ruiz_admm_run, P_l, lq.G_l,
                            lq.q_l, lq.lo_l, lq.hi_l)
        # checks histogram: rep 0 is the cold solve, reps 1+ are warm
        _, chks = jax.jit(ruiz_admm_chain)(P_l, lq.G_l, lq.q_l, lq.lo_l,
                                           lq.hi_l)
        chks = np.asarray(chks).astype(int)
        report["admm_checks_cold_hist"] = np.bincount(
            chks[0], minlength=checks_n + 1).tolist()
        report["admm_checks_warm_hist"] = np.bincount(
            chks[-1], minlength=checks_n + 1).tolist()
    else:
        t_admm_all = 0.0
        report["admm_all_ms"] = None

        # ---- stage: polish (XLA path) ----
        @jax.jit
        def polish_chain(P, q, G, lo, hi, x, y):
            def body(x_, _):
                sol = jax.vmap(
                    lambda p_, q_, g_, l_, h_, xx, yy: _polish_and_select(
                        p_, q_, g_, l_, h_, xx, yy,
                        jnp.max(jnp.abs(g_ @ xx - jnp.clip(g_ @ xx, l_, h_))),
                        jnp.asarray(0.0, dtype), 1e-4)
                )(P, q, G, lo, hi, x_, y)
                return x_ + eps * sol.x, ()
            xf, _ = jax.lax.scan(body, x, None, length=K)
            return xf

        t_polish = timed("polish", polish_chain, cqp.P, cqp.q, cqp.G, cqp.lo,
                         cqp.hi, x_, z_)

    # ---- stage: full batched solver (cross-check of solver stages) ----
    @jax.jit
    def solver_chain(P, q, G, lo, hi):
        def body(q_, _):
            sol = solve_box_qp_batched(
                P, q_, G, lo, hi, rounds=cfg.admm_rounds, iters=cfg.admm_iters,
                rho0=cfg.admm_rho, sigma=cfg.admm_sigma, alpha=cfg.admm_alpha,
                polish=cfg.polish, use_pallas=use_pallas)
            return q_ + eps * sol.x, ()
        qf, _ = jax.lax.scan(body, q, None, length=K)
        return qf

    t_solver = timed("solver_total", solver_chain, cqp.P, cqp.q, cqp.G,
                     cqp.lo, cqp.hi)

    R = cfg.admm_rounds
    if use_pallas:
        accounted = t_ref + t_cond + t_ruiz_admm + t_polish
    else:
        accounted = (t_ref + t_lc + t_ruiz
                     + R * (t_factor1 + t_admm1 + t_resid1) + t_polish)
    report["accounted_ms"] = round(accounted, 2)
    report["unaccounted_ms"] = round(t_full - accounted, 2)
    report["note"] = (
        "stage timings are measured STANDALONE (each its own fused jit "
        "chain); composition changes XLA fusion, so stage sums need not "
        "equal full_tick_ms and unaccounted_ms may be negative")

    # ---- analytic roofline for the ADMM kernel ----
    it_flops = 2 * (n * n + 2 * m * n) + 8 * (n + m)      # per scen per iter
    kernel_flops = B * cfg.admm_iters * it_flops          # one round
    vmem_bytes = B * 4 * (n * n + 2 * m * n + 3 * n + 4 * m + 1)
    report["admm_kernel"] = {
        "flops_per_iter_per_scenario": it_flops,
        "round_gflops": round(kernel_flops / 1e9, 2),
        "achieved_gflops_per_s": round(kernel_flops / (t_admm1 / 1e3) / 1e9, 1)
        if use_pallas else None,
        "resident_bytes_per_128_scenarios": 128 * 4 * (n * n + 2 * m * n + 3 * n + 4 * m + 1),
        "hbm_bytes_per_round": vmem_bytes,   # loaded once; iters run in VMEM
        "note": ("per-scenario matvecs with the batch in the lane dim run on "
                 "the VPU (independent small matrices cannot tile onto the "
                 "128x128 MXU); v5e VPU fp32 peak ~= 3.9 TFLOP/s"),
    }

    out = json.dumps(report, indent=2)
    print(out)
    paths = [a for a in sys.argv[1:] if not a.startswith("--")]
    if paths:
        with open(paths[0], "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
