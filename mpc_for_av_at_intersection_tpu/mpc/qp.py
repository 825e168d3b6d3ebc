"""Batched dense box-constrained QP solver: OSQP-style ADMM + active-set polish.

Replaces the reference's CVXPY/ECOS interior-point solve
(``main/lib/mpc.py:193-194``) with a TPU-shaped algorithm:

- fixed iteration counts (no data-dependent control flow under jit),
- one small Cholesky refactorization per outer round (rho adaptation),
- an active-set polish solve that recovers interior-point-level accuracy
  when ADMM has identified the active set (the usual case),
- everything dtype-polymorphic and vmap-batchable: (B, n, n) Cholesky +
  (B, m, n) matvecs ride the MXU.

Problem form: min 1/2 x'Px + q'x  s.t.  lo <= Gx <= hi.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QPSolution(NamedTuple):
    x: jnp.ndarray          # (n,) primal solution
    y: jnp.ndarray          # (m,) dual for lo <= Gx <= hi (+: upper, -: lower)
    polished: jnp.ndarray   # () bool — polish accepted
    prim_res: jnp.ndarray   # () inf-norm of primal residual (pre-polish)
    dual_res: jnp.ndarray   # () inf-norm of dual residual (pre-polish)


def _ruiz_equilibrate(P, q, G, iters: int = 10):
    """Modified Ruiz equilibration of the KKT operator [[P, G'], [G, 0]]
    plus OSQP-style cost normalization. Returns (d, e, c): variable scaling,
    constraint scaling, cost scaling. Dramatically evens out ADMM
    convergence across instances (cost scales here span 1e-2..260)."""
    n = P.shape[0]
    m = G.shape[0]
    dtype = P.dtype
    # carries seeded from inputs so varying-axis types line up under
    # shard_map (a constant init would mismatch the varying loop output)
    zero = q[0] * 0.0
    d = jnp.ones((n,), dtype) + zero
    e = jnp.ones((m,), dtype) + zero
    c = jnp.asarray(1.0, dtype) + zero
    eps = jnp.asarray(1e-8, dtype)

    def body(_, carry):
        d, e, c = carry
        Ps = (c * d[:, None]) * P * d[None, :]
        Gs = e[:, None] * G * d[None, :]
        col_x = jnp.maximum(
            jnp.max(jnp.abs(Ps), axis=0), jnp.max(jnp.abs(Gs), axis=0)
        )
        row_y = jnp.max(jnp.abs(Gs), axis=1)
        d = d / jnp.sqrt(jnp.maximum(col_x, eps))
        e = e / jnp.sqrt(jnp.maximum(row_y, eps))
        # cost normalization
        Ps = (c * d[:, None]) * P * d[None, :]
        qs = c * d * q
        g = jnp.maximum(
            jnp.mean(jnp.max(jnp.abs(Ps), axis=0)), jnp.max(jnp.abs(qs))
        )
        c = c / jnp.maximum(g, eps)
        return d, e, c

    d, e, c = jax.lax.fori_loop(0, iters, body, (d, e, c))
    return d, e, c


def _admm_round(P, q, G, lo, hi, sigma, alpha, iters):
    def run(state):
        x, z, y, rho = state
        n = P.shape[0]
        M = P + sigma * jnp.eye(n, dtype=P.dtype) + rho * (G.T @ G)
        L = jnp.linalg.cholesky(M)
        # explicit inverse: one triangular solve with n right-hand sides per
        # round, so the hot inner loop is pure matvecs (TPU's batched
        # 1-rhs triangular solves are an order of magnitude slower);
        # accuracy is recovered by the active-set polish afterwards
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.eye(n, dtype=P.dtype))

        def it(carry, _):
            x, z, y = carry
            rhs = sigma * x - q + G.T @ (rho * z - y)
            xt = Minv @ rhs
            Gxt = G @ xt
            x_n = alpha * xt + (1.0 - alpha) * x
            z_t = alpha * Gxt + (1.0 - alpha) * z
            z_n = jnp.clip(z_t + y / rho, lo, hi)
            y_n = y + rho * (z_t - z_n)
            return (x_n, z_n, y_n), None

        (x, z, y), _ = jax.lax.scan(it, (x, z, y), None, length=iters)

        # residuals + OSQP-style rho adaptation
        Gx = G @ x
        prim = jnp.max(jnp.abs(Gx - z))
        dual = jnp.max(jnp.abs(P @ x + q + G.T @ y))
        prim_rel = prim / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Gx)), jnp.max(jnp.abs(z))), 1e-6
        )
        dual_rel = dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(P @ x)), jnp.max(jnp.abs(q))), 1e-6
        )
        rho_n = jnp.clip(
            rho * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)), 1e-6, 1e6
        )
        return (x, z, y, rho_n), (prim, dual)

    return run


class _PolishFactors(NamedTuple):
    """Active-set-independent factorizations, shared across attempts."""

    Lp: jnp.ndarray        # (n, n) Cholesky of P
    H: jnp.ndarray         # (m, m) G P^-1 G'
    Piq: jnp.ndarray       # (n,) P^-1 q


def _polish_factor(P, q, G):
    """One Cholesky of P + one Gram matrix; every active-set guess then
    costs only a Cholesky of its masked (m, m) Schur complement — no
    pivoted LU anywhere (batched LU is the slowest linalg op on TPU)."""
    Lp = jnp.linalg.cholesky(P)
    Y = jax.scipy.linalg.cho_solve((Lp, True), G.T)    # (n, m) = P^-1 G'
    H = G @ Y
    Piq = jax.scipy.linalg.cho_solve((Lp, True), q)
    return _PolishFactors(Lp, H, Piq)


def _polish_masks(P, q, G, lo, hi, act_lo, act_hi, fac: _PolishFactors):
    """Equality-constrained resolve on a given active-set guess via the
    Schur complement of the KKT system.

    Fixed-shape trick: inactive rows contribute an identity row to the
    Schur matrix S = D H D + (I - D), forcing their multiplier to zero, so
    S keeps shape (m, m) regardless of which set is active. One step of
    iterative refinement through the same factorizations recovers fp32
    accuracy (the explicit P^-1 round-trip loses a few digits).
    """
    m = G.shape[0]
    dtype = P.dtype
    act = act_lo | act_hi
    d = act.astype(dtype)
    b = jnp.where(act_lo, lo, hi)

    S = d[:, None] * fac.H * d[None, :] + jnp.diag(1.0 - d)
    Ls = jnp.linalg.cholesky(S)

    def kkt_solve(r1, r2):
        # P dx + G'D dl = r1 ; D G dx = r2 ; (I-D) dl = 0
        Pir1 = jax.scipy.linalg.cho_solve((fac.Lp, True), r1)
        dl = jax.scipy.linalg.cho_solve((Ls, True), d * (G @ Pir1) - r2)
        dx = Pir1 - jax.scipy.linalg.cho_solve((fac.Lp, True), G.T @ (d * dl))
        return dx, dl

    xp, lam = kkt_solve(-q, d * b)
    # one refinement pass (exact KKT residual through the same factors)
    r1 = -(q + P @ xp + G.T @ (d * lam))
    r2 = d * (b - G @ xp)
    dx, dl = kkt_solve(r1, r2)
    xp = xp + dx
    lam = lam + dl
    return xp, d * lam


def _polish(P, q, G, lo, hi, x, y, act_tol):
    """Dual-identified polish (backward-compatible single-attempt entry)."""
    fac = _polish_factor(P, q, G)
    return _polish_masks(P, q, G, lo, hi, y < -act_tol, y > act_tol, fac)


def _polish_and_select(P, q, G, lo, hi, x, y, prim, dual, act_tol_rel):
    """Two-attempt polish with branchless selection.

    Attempt 1 identifies the active set from the ADMM duals (the OSQP
    recipe). Attempt 2 re-identifies it from primal proximity (|Gx - bound|
    small) — this rescues the rare instances where a loosely-converged dual
    mis-identifies the set (the observed ~1/25k fleet-tick failure tail).
    The P-Cholesky and Gram matrix are factored once and shared; each
    attempt adds only an (m, m) Cholesky, and always computing both keeps
    the path branchless under jit/vmap.
    """
    fac = _polish_factor(P, q, G)
    y_scale = jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
    tol = act_tol_rel * y_scale
    xp1, yp1 = _polish_masks(P, q, G, lo, hi, y < -tol, y > tol, fac)

    Gx = G @ x
    row_span = jnp.maximum(jnp.maximum(jnp.abs(lo), jnp.abs(hi)), 1.0)
    ptol = 1e-3 * row_span
    # a row cannot be active at both bounds; break ties toward the closer one
    near_lo = (Gx - lo <= ptol) & (Gx - lo <= hi - Gx)
    near_hi = (hi - Gx <= ptol) & (hi - Gx < Gx - lo)
    xp2, yp2 = _polish_masks(P, q, G, lo, hi, near_lo, near_hi, fac)

    span = jnp.maximum(jnp.max(jnp.abs(hi)), 1.0)
    obj = 0.5 * x @ (P @ x) + q @ x

    def accept(xp, yp):
        Gxp = G @ xp
        viol = jnp.max(jnp.maximum(Gxp - hi, lo - Gxp))
        obj_p = 0.5 * xp @ (P @ xp) + q @ xp
        finite = jnp.all(jnp.isfinite(xp)) & jnp.all(jnp.isfinite(yp))
        return finite & (viol <= 1e-5 * span) & (
            obj_p <= obj + 1e-6 * jnp.abs(obj) + 1e-6
        )

    ok1 = accept(xp1, yp1)
    ok2 = accept(xp2, yp2)
    ok = ok1 | ok2
    x_out = jnp.where(ok1, xp1, jnp.where(ok2, xp2, x))
    y_out = jnp.where(ok1, yp1, jnp.where(ok2, yp2, y))
    # report the primal infeasibility of the RETURNED x (a successful polish
    # means an exact solve even when the raw ADMM residual was loose)
    Gx_out = G @ x_out
    viol_out = jnp.max(
        jnp.maximum(jnp.maximum(Gx_out - hi, lo - Gx_out), 0.0)
    )
    prim_out = jnp.where(ok, viol_out, jnp.maximum(prim, viol_out))
    return QPSolution(x_out, y_out, ok, prim_out, dual)


def solve_box_qp(
    P,
    q,
    G,
    lo,
    hi,
    rounds: int = 6,
    iters: int = 30,
    rho0: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    polish: bool = True,
    act_tol_rel: float = 1e-4,
    scale: bool = True,
) -> QPSolution:
    """Solve one dense box-QP (vmap over a leading batch axis to batch).

    NOTE: runs under true-f32 matmul precision — TPU's default bf16x3
    matmul passes measurably degrade polish acceptance / residuals
    (observed ~1% solve failures in fleet runs without this).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_box_qp_impl(
            P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
            polish, act_tol_rel, scale,
        )


def _solve_box_qp_impl(
    P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
    polish, act_tol_rel, scale,
) -> QPSolution:
    n = P.shape[0]
    m = G.shape[0]
    dtype = P.dtype

    if scale:
        d, e, c = _ruiz_equilibrate(P, q, G)
        Ps = (c * d[:, None]) * P * d[None, :]
        qs = c * d * q
        Gs = e[:, None] * G * d[None, :]
        los = e * lo
        his = e * hi
    else:
        d = jnp.ones((n,), dtype)
        e = jnp.ones((m,), dtype)
        c = jnp.asarray(1.0, dtype)
        Ps, qs, Gs, los, his = P, q, G, lo, hi

    # init seeded from inputs so scan-carry varying-axis types line up
    # under shard_map
    zero = q[0] * 0.0
    x = jnp.zeros((n,), dtype) + zero
    z = jnp.clip(jnp.zeros((m,), dtype) + zero, los, his)
    y = jnp.zeros((m,), dtype) + zero
    rho = jnp.asarray(rho0, dtype) + zero

    runner = _admm_round(Ps, qs, Gs, los, his, sigma, alpha, iters)

    def round_body(state, _):
        state, res = runner(state)
        return state, res

    state, res_hist = jax.lax.scan(
        round_body, (x, z, y, rho), None, length=rounds
    )
    prim, dual = res_hist[0][-1], res_hist[1][-1]
    xs, zs, ys, rho = state

    # unscale back to the original problem
    x = d * xs
    y = (e * ys) / c

    if not polish:
        Gx = G @ x
        viol = jnp.max(jnp.maximum(jnp.maximum(Gx - hi, lo - Gx), 0.0))
        return QPSolution(x, y, jnp.asarray(False), viol, dual)

    return _polish_and_select(P, q, G, lo, hi, x, y, prim, dual, act_tol_rel)


def solve_box_qp_batched(
    P,      # (B, n, n)
    q,      # (B, n)
    G,      # (B, m, n)
    lo,     # (B, m)
    hi,     # (B, m)
    rounds: int = 10,
    iters: int = 50,
    rho0: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    polish: bool = True,
    use_pallas: bool = True,
    interpret: bool = False,
) -> QPSolution:
    """Natively batched solver: same algorithm as ``solve_box_qp`` but with
    the ADMM inner loop fused into a Pallas TPU kernel (scenarios in the
    lane dimension). Factorization, rho adaptation, and polish remain XLA.
    Falls back to vmapped XLA matvecs when Pallas is unavailable."""
    with jax.default_matmul_precision("float32"):
        return _solve_box_qp_batched_impl(
            P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
            polish, use_pallas, interpret,
        )


def _solve_box_qp_batched_impl(
    P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
    polish, use_pallas, interpret,
) -> QPSolution:
    from ..ops.admm_pallas import (
        LANES,
        admm_all_rounds_pallas,
    )

    B, n = q.shape
    m = lo.shape[1]
    dtype = q.dtype

    d, e, c = jax.vmap(_ruiz_equilibrate)(P, q, G)
    Ps = (c[:, None, None] * d[:, :, None]) * P * d[:, None, :]
    qs = c[:, None] * d * q
    Gs = e[:, :, None] * G * d[:, None, :]
    los = e * lo
    his = e * hi

    x = jnp.zeros((B, n), dtype)
    z = jnp.clip(jnp.zeros((B, m), dtype), los, his)
    y = jnp.zeros((B, m), dtype)
    rho = jnp.full((B,), rho0, dtype)

    pad = 0
    if use_pallas and B % LANES != 0:
        pad = LANES - B % LANES

    eye = jnp.eye(n, dtype=dtype)

    if use_pallas:
        # the ENTIRE ADMM phase — every round's factorization (lanes
        # Cholesky + explicit inverse), inner iterations, residuals, and
        # the rho rule — as ONE Pallas launch: P/G stream from HBM once
        # instead of once per round (137 MB/round at B=4096, PROFILE_r03)
        def padd(a):
            # repeat the last row: works for any pad, including pad > B
            # (e.g. an 8-ego multi-ego tick on the 128-lane kernel)
            return (jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
                    if pad else a)

        xp, zp, yp, prim_p, dual_p = admm_all_rounds_pallas(
            padd(Ps), padd(Gs), padd(qs), padd(los), padd(his),
            padd(rho), padd(x), padd(z), padd(y),
            rounds, iters, sigma, alpha, interpret=interpret,
        )
        x = xp[:B].astype(dtype)
        z = zp[:B].astype(dtype)
        y = yp[:B].astype(dtype)
        prim = prim_p[:B].astype(dtype)
        dual = dual_p[:B].astype(dtype)
        # unscale
        x = d * x
        y = (e * y) / c[:, None]
        return _finish_batched(
            P, q, G, lo, hi, x, y, prim, dual, polish,
            use_pallas, interpret, pad, dtype,
        )

    def round_body(carry, _):
        x, z, y, rho = carry

        # XLA fallback path (non-TPU backends)
        GtG = jnp.einsum("bmn,bmk->bnk", Gs, Gs)
        M = Ps + sigma * eye[None] + rho[:, None, None] * GtG
        L = jnp.linalg.cholesky(M)
        Minv = jax.scipy.linalg.cho_solve((L, True), jnp.broadcast_to(eye, (B, n, n)))

        def it(carry, _):
            x, z, y = carry
            t = rho[:, None] * z - y
            rhs = sigma * x - qs + jnp.einsum("bmn,bm->bn", Gs, t)
            xt = jnp.einsum("bnk,bk->bn", Minv, rhs)
            Gxt = jnp.einsum("bmn,bn->bm", Gs, xt)
            xn = alpha * xt + (1 - alpha) * x
            zt = alpha * Gxt + (1 - alpha) * z
            zn = jnp.clip(zt + y / rho[:, None], los, his)
            yn = y + rho[:, None] * (zt - zn)
            return (xn, zn, yn), None

        (x, z, y), _ = jax.lax.scan(it, (x, z, y), None, length=iters)

        # residuals + rho adaptation (per scenario)
        Gx = jnp.einsum("bmn,bn->bm", Gs, x)
        prim = jnp.max(jnp.abs(Gx - z), axis=1)
        Px = jnp.einsum("bnk,bk->bn", Ps, x)
        Gty = jnp.einsum("bmn,bm->bn", Gs, y)
        dual = jnp.max(jnp.abs(Px + qs + Gty), axis=1)
        prim_rel = prim / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Gx), axis=1), jnp.max(jnp.abs(z), axis=1)),
            1e-6,
        )
        dual_rel = dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px), axis=1), jnp.max(jnp.abs(qs), axis=1)),
            1e-6,
        )
        rho_n = jnp.clip(
            rho * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)), 1e-6, 1e6
        )
        return (x, z, y, rho_n), (prim, dual)

    (x, z, y, rho), (prims, duals) = jax.lax.scan(
        round_body, (x, z, y, rho), None, length=rounds
    )
    prim, dual = prims[-1], duals[-1]

    # unscale
    x = d * x
    y = (e * y) / c[:, None]

    return _finish_batched(
        P, q, G, lo, hi, x, y, prim, dual, polish,
        use_pallas, interpret, pad, dtype,
    )


def _finish_batched(P, q, G, lo, hi, x, y, prim, dual, polish,
                    use_pallas, interpret, pad, dtype):
    """Polish dispatch shared by the Pallas and XLA batched paths."""
    B = q.shape[0]

    if polish and use_pallas:
        # the whole two-attempt polish + select as ONE Pallas launch — the
        # XLA version was 46% of the controller tick (PROFILE.md §2),
        # dominated by batched (B, m, m) Cholesky + Gram HBM round-trips
        from ..ops.admm_pallas import polish_select_pallas

        def padp(a):
            return (jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
                    if pad else a)

        xp, yp, ok, prim_out = polish_select_pallas(
            padp(P), padp(q), padp(G), padp(lo), padp(hi),
            padp(x), padp(y), padp(prim), act_tol_rel=1e-4,
            interpret=interpret,
        )
        return QPSolution(
            xp[:B].astype(dtype), yp[:B].astype(dtype), ok[:B],
            prim_out[:B].astype(dtype), dual,
        )

    def finish(P, q, G, lo, hi, x, y, prim, dual):
        if not polish:
            Gx = G @ x
            viol = jnp.max(jnp.maximum(jnp.maximum(Gx - hi, lo - Gx), 0.0))
            return QPSolution(x, y, jnp.asarray(False), viol, dual)
        return _polish_and_select(P, q, G, lo, hi, x, y, prim, dual, 1e-4)

    return jax.vmap(finish)(P, q, G, lo, hi, x, y, prim, dual)


def solve_box_qp_lanes(
    P_l, q_l, G_l, lo_l, hi_l,    # lanes layout (Bt, ..., 128), UNSCALED
    B0: int,
    rounds: int = 10,
    iters: int = 50,
    rho0: float = 0.1,
    sigma: float = 1e-6,
    alpha: float = 1.6,
    interpret: bool = False,
) -> QPSolution:
    """Fully lanes-resident solve: in-kernel Ruiz + all ADMM rounds (one
    launch) then the two-attempt polish (one launch), with the big QP
    tensors never leaving the kernel-native layout. Polish is mandatory on
    this path (it produces the reported primal residual)."""
    from ..ops.admm_pallas import (
        polish_select_pallas_lanes,
        ruiz_admm_all_rounds_pallas,
    )

    with jax.default_matmul_precision("float32"):
        x, y, prim, dual = ruiz_admm_all_rounds_pallas(
            P_l, G_l, q_l, lo_l, hi_l, rounds, iters, rho0, sigma, alpha,
            interpret=interpret,
        )
        xp, yp, ok, prim_out = polish_select_pallas_lanes(
            P_l, G_l, q_l, lo_l, hi_l, x, y, prim, act_tol_rel=1e-4,
            interpret=interpret,
        )
    return QPSolution(xp[:B0], yp[:B0], ok[:B0], prim_out[:B0], dual[:B0])


def kkt_residuals(P, q, G, lo, hi, x, y):
    """(stationarity, primal, complementarity) inf-norm residuals — the
    correctness certificate used by tests and by the float64 oracle."""
    Gx = G @ x
    stat = jnp.max(jnp.abs(P @ x + q + G.T @ y))
    prim = jnp.max(jnp.maximum(jnp.maximum(Gx - hi, lo - Gx), 0.0))
    y_pos = jnp.maximum(y, 0.0)
    y_neg = jnp.minimum(y, 0.0)
    comp = jnp.max(jnp.abs(y_pos * (hi - Gx)) + jnp.abs(y_neg * (Gx - lo)))
    return stat, prim, comp
