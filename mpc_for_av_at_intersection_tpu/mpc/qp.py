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
    # diagnostics for cross-tick warm starting (round-5): final ADMM
    # penalty (scaled problem) and number of iteration blocks executed
    rho: jnp.ndarray = None
    checks: jnp.ndarray = None


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
    # OSQP-style delta regularization: a degenerate active set (e.g. a
    # velocity row that is a linear combination of active accel rows —
    # routine when braking to a stop) makes S singular; the ridge keeps
    # the factorization stable and the refinement pass below recovers the
    # accuracy. The accept test still guards the result.
    reg = 1e-7 * jnp.maximum(jnp.max(jnp.diag(S)), 1.0)
    S = S + reg * jnp.eye(m, dtype=dtype)
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
    warm=None,                  # None | (x0 (n,), y0 (m,), rho_w ())
    eps: float = 0.0,           # relative-residual early exit (0 = off)
    refactor_band: float = 0.0,  # rho drift band (<= 1 = refactor always)
    stall_cap: float = 0.0,      # stall-exit score cap (0 = off)
    stall_ratio: float = 0.5,    # min per-block improvement factor
    ruiz_iters: int = 10,
) -> QPSolution:
    """Solve one dense box-QP (vmap over a leading batch axis to batch).

    ``rounds`` x ``iters`` is the iteration budget (refactorize + rho
    adapt between rounds). With ``eps > 0`` the solver exits as soon as
    both relative residuals drop below it, and with ``refactor_band > 1``
    rounds reuse the previous factorization while rho stays inside the
    band (OSQP's direct-solver policy). ``warm`` carries the previous
    tick's (x, y, rho) — the cross-tick closed-loop MPC warm start
    (reference intent: ``main/lib/mpc.py:222-224``).

    NOTE: runs under true-f32 matmul precision — TPU's default bf16x3
    matmul passes measurably degrade polish acceptance / residuals
    (observed ~1% solve failures in fleet runs without this).
    """
    with jax.default_matmul_precision("float32"):
        return _solve_box_qp_impl(
            P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
            polish, act_tol_rel, scale, warm, eps, refactor_band,
            stall_cap, stall_ratio, ruiz_iters,
        )


def _solve_box_qp_impl(
    P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
    polish, act_tol_rel, scale, warm=None, eps=0.0, refactor_band=0.0,
    stall_cap=0.0, stall_ratio=0.5, ruiz_iters=10,
) -> QPSolution:
    n = P.shape[0]
    m = G.shape[0]
    dtype = P.dtype

    if scale:
        d, e, c = _ruiz_equilibrate(P, q, G, iters=ruiz_iters)
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
    # under shard_map; warm start scaled into the equilibrated problem
    zero = q[0] * 0.0
    if warm is None:
        x = jnp.zeros((n,), dtype) + zero
        y = jnp.zeros((m,), dtype) + zero
        rho = jnp.asarray(rho0, dtype) + zero
    else:
        x0, y0, rho_w = warm
        x = x0 / d + zero
        y = (c * y0) / e + zero
        rho = jnp.asarray(rho_w, dtype) + zero
    z = jnp.clip(Gs @ x, los, his)

    # seeded from inputs: under shard_map the cond-wrapped factorization
    # requires every operand's varying axes to match
    eye = jnp.eye(n, dtype=dtype) + zero

    def factorize(rho):
        M = Ps + sigma * eye + rho * (Gs.T @ Gs)
        L = jnp.linalg.cholesky(M)
        # explicit inverse: one triangular solve with n right-hand sides
        # per factorization, so the hot inner loop is pure matvecs
        # (batched 1-rhs triangular solves are an order of magnitude
        # slower on TPU); accuracy is recovered by the polish afterwards
        return jax.scipy.linalg.cho_solve((L, True), eye)

    def check_cond(carry):
        (k, x, z, y, rho_f, rho_p, refac, Minv, prim, dual,
         done, prev_score) = carry
        return (k < rounds) & jnp.logical_not(done)

    def check_body(carry):
        (k, x, z, y, rho_f, rho_p, refac, Minv, prim, dual,
         done, prev_score) = carry
        Minv = jax.lax.cond(refac, lambda: factorize(rho_p), lambda: Minv)
        rho_v = jnp.where(refac, rho_p, rho_f)

        def it(carry, _):
            x, z, y = carry
            rhs = sigma * x - qs + Gs.T @ (rho_v * z - y)
            xt = Minv @ rhs
            Gxt = Gs @ xt
            x_n = alpha * xt + (1.0 - alpha) * x
            z_t = alpha * Gxt + (1.0 - alpha) * z
            z_n = jnp.clip(z_t + y / rho_v, los, his)
            y_n = y + rho_v * (z_t - z_n)
            return (x_n, z_n, y_n), None

        (x, z, y), _ = jax.lax.scan(it, (x, z, y), None, length=iters)

        # residuals + OSQP-style rho adaptation
        Gx = Gs @ x
        prim = jnp.max(jnp.abs(Gx - z))
        Px = Ps @ x
        dual = jnp.max(jnp.abs(Px + qs + Gs.T @ y))
        prim_rel = prim / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Gx)), jnp.max(jnp.abs(z))), 1e-6
        )
        dual_rel = dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px)), jnp.max(jnp.abs(qs))), 1e-6
        )
        rho_n = jnp.clip(
            rho_v * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)),
            1e-6, 1e6,
        )
        score = jnp.maximum(prim_rel, dual_rel)
        if eps > 0.0:
            done = (prim_rel <= eps) & (dual_rel <= eps)
            if stall_cap > 0.0:
                # stall exit (see the kernel twin): near-converged but no
                # longer improving -> stop and let the polish finish
                done = done | ((score <= stall_cap)
                               & (score > stall_ratio * prev_score)
                               & (prim <= 5e-3))
        prev_score = score
        if refactor_band > 1.0:
            ratio = rho_n / rho_v
            refac_n = ((ratio > refactor_band)
                       | (ratio * refactor_band < 1.0)) & jnp.logical_not(done)
        else:
            refac_n = jnp.asarray(True)
        return (k + 1, x, z, y, rho_v, rho_n, refac_n, Minv, prim, dual,
                done, prev_score)

    # non-scalar/boolean carries seeded from inputs so varying-axis types
    # line up under shard_map (a constant init would mismatch the varying
    # loop outputs)
    carry0 = (
        jnp.asarray(0, jnp.int32), x, z, y, rho, rho,
        zero == 0.0, jnp.zeros((n, n), dtype) + zero,
        jnp.zeros((), dtype) + zero, jnp.zeros((), dtype) + zero,
        zero > 1.0, jnp.full((), 1e30, dtype) + zero,
    )
    (k, xs, zs, ys, rho_f, _, _, _, prim, dual, _, _) = jax.lax.while_loop(
        check_cond, check_body, carry0
    )

    # unscale back to the original problem
    x = d * xs
    y = (e * ys) / c

    if not polish:
        Gx = G @ x
        viol = jnp.max(jnp.maximum(jnp.maximum(Gx - hi, lo - Gx), 0.0))
        return QPSolution(x, y, jnp.asarray(False), viol, dual,
                          rho=rho_f, checks=k)

    sol = _polish_and_select(P, q, G, lo, hi, x, y, prim, dual, act_tol_rel)
    return sol._replace(rho=rho_f, checks=k)


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
    warm=None,                  # None | (x0 (B, n), y0 (B, m), rho_w (B,))
    eps: float = 0.0,
    refactor_band: float = 0.0,
    stall_cap: float = 0.0,
    stall_ratio: float = 0.5,
    ruiz_iters: int = 10,
) -> QPSolution:
    """Natively batched solver: same algorithm as ``solve_box_qp``. The
    Pallas path re-lays the batch into the kernel-native lanes layout and
    runs the single-launch in-kernel Ruiz + adaptive ADMM + lanes polish
    (the same kernels as the production ``solve_box_qp_lanes`` pipeline).
    Falls back to batched XLA matvecs when Pallas is unavailable."""
    with jax.default_matmul_precision("float32"):
        return _solve_box_qp_batched_impl(
            P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
            polish, use_pallas, interpret, warm, eps, refactor_band,
            stall_cap, stall_ratio, ruiz_iters,
        )


def _solve_box_qp_batched_impl(
    P, q, G, lo, hi, rounds, iters, rho0, sigma, alpha,
    polish, use_pallas, interpret, warm=None, eps=0.0, refactor_band=0.0,
    stall_cap=0.0, stall_ratio=0.5, ruiz_iters=10,
) -> QPSolution:
    from ..ops.admm_pallas import LANES

    B, n = q.shape
    m = lo.shape[1]
    dtype = q.dtype

    pad = 0
    if use_pallas and B % LANES != 0:
        pad = LANES - B % LANES

    if use_pallas:
        # re-lay into the kernel-native lanes layout and run the unified
        # production pipeline: in-kernel Ruiz + warm-started adaptive ADMM
        # (one launch) + the two-attempt lanes polish (one launch)
        def padd(a):
            # repeat the last row: works for any pad, including pad > B
            # (e.g. an 8-ego multi-ego tick on the 128-lane kernel)
            return (jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)
                    if pad else a)

        Bp = B + pad
        Bt = Bp // LANES

        def t_mat(a, r, cdim):
            return a.reshape(Bt, LANES, r, cdim).transpose(0, 2, 3, 1)

        def t_vec(a, r):
            return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

        warm_p = None
        if warm is not None:
            x0, y0, rho_w = warm
            warm_p = (padd(x0), padd(y0), padd(rho_w))
        return solve_box_qp_lanes(
            t_mat(padd(P), n, n), t_vec(padd(q), n),
            t_mat(padd(G), m, n), t_vec(padd(lo), m), t_vec(padd(hi), m),
            B0=B, rounds=rounds, iters=iters, rho0=rho0, sigma=sigma,
            alpha=alpha, interpret=interpret, warm=warm_p, eps=eps,
            refactor_band=refactor_band, polish=polish,
            stall_cap=stall_cap, stall_ratio=stall_ratio,
            ruiz_iters=ruiz_iters,
        )

    d, e, c = jax.vmap(lambda P_, q_, G_: _ruiz_equilibrate(
        P_, q_, G_, iters=ruiz_iters))(P, q, G)
    Ps = (c[:, None, None] * d[:, :, None]) * P * d[:, None, :]
    qs = c[:, None] * d * q
    Gs = e[:, :, None] * G * d[:, None, :]
    los = e * lo
    his = e * hi

    if warm is None:
        x = jnp.zeros((B, n), dtype)
        y = jnp.zeros((B, m), dtype)
        rho = jnp.full((B,), rho0, dtype)
    else:
        x0, y0, rho_w = warm
        x = x0 / d
        y = (c[:, None] * y0) / e
        rho = rho_w.astype(dtype)
    z = jnp.clip(jnp.einsum("bmn,bn->bm", Gs, x), los, his)

    # seeded from inputs for shard_map varying-axis alignment
    eye = jnp.eye(n, dtype=dtype) + q[0, 0] * 0.0

    def factorize(rho):
        GtG = jnp.einsum("bmn,bmk->bnk", Gs, Gs)
        M = Ps + sigma * eye[None] + rho[:, None, None] * GtG
        L = jnp.linalg.cholesky(M)
        return jax.scipy.linalg.cho_solve(
            (L, True), jnp.broadcast_to(eye, (B, n, n)))

    # Per-SCENARIO adaptive policy, mirroring the kernel's per-lane one
    # (and the vmapped single-scenario solver): each row freezes at its
    # own convergence, tracks its own rho, refactorizes on its own drift.
    def check_cond(carry):
        (k, x, z, y, rho_f, rho_p, refac, conv, Minv,
         prim, dual, checks_v, prev_score) = carry
        return (k < rounds) & jnp.logical_not(jnp.all(conv))

    def check_body(carry):
        (k, x, z, y, rho_f, rho_p, refac, conv, Minv,
         prim, dual, checks_v, prev_score) = carry
        rho_v = jnp.where(refac, rho_p, rho_f)
        Minv = jax.lax.cond(
            jnp.any(refac), lambda: factorize(rho_v), lambda: Minv)
        checks_v = checks_v + jnp.logical_not(conv).astype(dtype)
        frz = conv[:, None]

        def it(carry, _):
            x, z, y = carry
            t = rho_v[:, None] * z - y
            rhs = sigma * x - qs + jnp.einsum("bmn,bm->bn", Gs, t)
            xt = jnp.einsum("bnk,bk->bn", Minv, rhs)
            Gxt = jnp.einsum("bmn,bn->bm", Gs, xt)
            xn = alpha * xt + (1 - alpha) * x
            zt = alpha * Gxt + (1 - alpha) * z
            zn = jnp.clip(zt + y / rho_v[:, None], los, his)
            yn = y + rho_v[:, None] * (zt - zn)
            return (jnp.where(frz, x, xn), jnp.where(frz, z, zn),
                    jnp.where(frz, y, yn)), None

        (x, z, y), _ = jax.lax.scan(it, (x, z, y), None, length=iters)

        # residuals + rho adaptation (per scenario)
        Gx = jnp.einsum("bmn,bn->bm", Gs, x)
        prim_n = jnp.max(jnp.abs(Gx - z), axis=1)
        Px = jnp.einsum("bnk,bk->bn", Ps, x)
        Gty = jnp.einsum("bmn,bm->bn", Gs, y)
        dual_n = jnp.max(jnp.abs(Px + qs + Gty), axis=1)
        prim = jnp.where(conv, prim, prim_n)
        dual = jnp.where(conv, dual, dual_n)
        prim_rel = prim / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Gx), axis=1), jnp.max(jnp.abs(z), axis=1)),
            1e-6,
        )
        dual_rel = dual / jnp.maximum(
            jnp.maximum(jnp.max(jnp.abs(Px), axis=1), jnp.max(jnp.abs(qs), axis=1)),
            1e-6,
        )
        rho_n = jnp.clip(
            rho_v * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)), 1e-6, 1e6
        )
        rho_f = jnp.where(conv, rho_f, rho_v)
        rho_p = jnp.where(conv, rho_p, rho_n)
        score = jnp.maximum(prim_rel, dual_rel)
        if eps > 0.0:
            conv_now = (prim_rel <= eps) & (dual_rel <= eps)
            if stall_cap > 0.0:
                # stall exit (see the kernel twin)
                conv_now = conv_now | ((score <= stall_cap)
                                       & (score > stall_ratio * prev_score)
                                       & (prim <= 5e-3))
            conv = conv | conv_now
        prev_score = jnp.where(conv, prev_score, score)
        if refactor_band > 1.0:
            ratio = rho_n / rho_v
            refac_n = (
                (ratio > refactor_band) | (ratio * refactor_band < 1.0)
            ) & jnp.logical_not(conv)
        else:
            refac_n = jnp.logical_not(conv)
        return (k + 1, x, z, y, rho_f, rho_p, refac_n, conv, Minv,
                prim, dual, checks_v, prev_score)

    # seeded from inputs for shard_map varying-axis alignment (see the
    # single-scenario twin)
    zeroB = q[:, 0] * 0.0
    falseB = zeroB > 1.0
    carry0 = (
        jnp.asarray(0, jnp.int32), x, z, y, rho, rho,
        jnp.logical_not(falseB), falseB,
        jnp.zeros((B, n, n), dtype) + zeroB[:, None, None],
        zeroB, zeroB, zeroB, zeroB + 1e30,
    )
    (k, x, z, y, rho_f, _, _, _, _, prim, dual, checks_v, _) = (
        jax.lax.while_loop(check_cond, check_body, carry0))

    # unscale
    x = d * x
    y = (e * y) / c[:, None]

    sol = _finish_batched(
        P, q, G, lo, hi, x, y, prim, dual, polish,
        use_pallas, interpret, pad, dtype,
    )
    return sol._replace(rho=rho_f, checks=checks_v)


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
    warm=None,                  # None | (x0, y0, rho_w) padded to Bt*LANES
    eps: float = 0.0,
    refactor_band: float = 0.0,
    polish: bool = True,
    stall_cap: float = 0.0,
    stall_ratio: float = 0.5,
    fused: bool = True,
    ruiz_iters: int = 10,
) -> QPSolution:
    """Fully lanes-resident solve: in-kernel Ruiz + warm-started adaptive
    ADMM + the two-attempt polish — by default as ONE fused launch
    (``solve_polish_fused_pallas``: P/G stream from HBM once and x/y/prim
    never leave VMEM between the phases), with the two-launch pipeline
    kept behind ``fused=False`` as the A/B twin. ``warm`` is the previous
    tick's (x, y, rho) in standard (B, ...) layout, padded to a full lane
    block; the returned ``rho`` feeds the next tick's warm."""
    from ..ops.admm_pallas import (
        polish_select_pallas_lanes,
        ruiz_admm_all_rounds_pallas,
        solve_polish_fused_pallas,
    )

    with jax.default_matmul_precision("float32"):
        if polish and fused:
            xp, yp, ok, prim_out, dual, rho_f, checks = (
                solve_polish_fused_pallas(
                    P_l, G_l, q_l, lo_l, hi_l, rounds, iters, rho0, sigma,
                    alpha, interpret=interpret, warm=warm, eps=eps,
                    refactor_band=refactor_band,
                    stall_cap=stall_cap, stall_ratio=stall_ratio,
                    ruiz_iters=ruiz_iters,
                ))
            return QPSolution(
                xp[:B0], yp[:B0], ok[:B0], prim_out[:B0], dual[:B0],
                rho=rho_f[:B0], checks=checks[:B0])
        x, y, prim, dual, rho_f, checks = ruiz_admm_all_rounds_pallas(
            P_l, G_l, q_l, lo_l, hi_l, rounds, iters, rho0, sigma, alpha,
            interpret=interpret, warm=warm, eps=eps,
            refactor_band=refactor_band,
            stall_cap=stall_cap, stall_ratio=stall_ratio,
            ruiz_iters=ruiz_iters,
        )
        if not polish:
            return QPSolution(
                x[:B0], y[:B0], jnp.zeros((B0,), bool), prim[:B0], dual[:B0],
                rho=rho_f[:B0], checks=checks[:B0],
            )
        xp, yp, ok, prim_out = polish_select_pallas_lanes(
            P_l, G_l, q_l, lo_l, hi_l, x, y, prim, act_tol_rel=1e-4,
            interpret=interpret,
        )
    return QPSolution(xp[:B0], yp[:B0], ok[:B0], prim_out[:B0], dual[:B0],
                      rho=rho_f[:B0], checks=checks[:B0])


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
