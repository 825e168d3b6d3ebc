"""Pallas TPU kernel: fused ADMM inner iterations for the batched box-QP.

The XLA path dispatches ~10 small ops per ADMM iteration (500+ dispatches
per solve round-trip through HBM). This kernel runs all inner iterations of
one round in VMEM in a single launch, with the *scenario batch in the lane
dimension*: every vector is stored transposed as (rows, 128 lanes), so an
(n x n) per-scenario matvec becomes n fused multiply-accumulates of
(rows, 128) tiles on the VPU — 128 scenarios advance per program.

Factorization (Cholesky -> explicit inverse), rho adaptation, and the
active-set polish stay in XLA; only the dispatch-bound iteration loop moves
into Pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANES = 128


def pallas_supported() -> bool:
    return jax.default_backend() == "tpu"


def _chol_inplace_panel(ref, size: int, panel: int = 8):
    """In-place lanes-Cholesky (lower) of a (size, size, 128) VMEM ref,
    PANELIZED: each column's trailing update touches only the static
    trailing submatrix ref[p0:, p0:] of its panel, cutting total work from
    3*size^3 (full masked updates) to ~size^3. Above-diagonal entries of
    rows < p0 are left stale — every consumer masks to the lower triangle.

    NOTE (divergence from ``jnp.linalg.cholesky``): pivots are clamped with
    sqrt(max(diag, 1e-30)), so an indefinite/singular input yields large
    finite values where XLA would produce NaN. The polish caller
    delta-regularizes its Schur matrix before calling (see
    ``_polish_kernel``), keeping both paths in the well-posed regime; the
    polish accept test (violation + objective + finiteness) bounds any
    residual divergence on degenerate active sets.
    """
    import jax.experimental.pallas as pl

    for p0 in range(0, size, panel):
        rem = size - p0
        r_i = p0 + jax.lax.broadcasted_iota(jnp.int32, (rem, 1, 1), 0)
        c_i = p0 + jax.lax.broadcasted_iota(jnp.int32, (1, rem, 1), 1)
        rv_i = p0 + jax.lax.broadcasted_iota(jnp.int32, (rem, 1), 0)
        for j in range(p0, min(p0 + panel, size)):
            Mv = ref[pl.ds(p0, rem), pl.ds(p0, rem), :]
            colj = jnp.sum(jnp.where(c_i == j, Mv, 0.0), axis=1)
            diag = jnp.sum(jnp.where(rv_i == j, colj, 0.0), axis=0)
            ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
            lcol = jnp.where(rv_i > j, colj / ljj[None, :],
                             jnp.where(rv_i == j, ljj[None, :], 0.0))
            upd = lcol[:, None, :] * lcol[None, :, :]
            live = (r_i > j) & (c_i > j)
            Mnew = Mv - jnp.where(live, upd, 0.0)
            ref[pl.ds(p0, rem), pl.ds(p0, rem), :] = jnp.where(
                c_i == j, lcol[:, None, :], Mnew)


def _kernel(n: int, m: int, iters: int, sigma: float, alpha: float,
            Minv, G, GT, q, lo, hi, rho, x0, z0, y0, xo, zo, yo):
    rho_v = rho[0, 0, :]                      # (128,)

    def matvec(ref, v, rows, k):
        # (rows, k, 128) * (1, k, 128) summed over k — static shapes, no
        # dynamic indexing (Mosaic cannot dynamic-slice values)
        return jnp.sum(ref[0] * v[None, :, :], axis=1)

    qv = q[0]                                  # (n, 128)
    lov = lo[0]
    hiv = hi[0]

    def it(_, carry):
        x, z, y = carry
        t = rho_v[None, :] * z - y
        rhs = sigma * x - qv + matvec(GT, t, n, m)
        xt = matvec(Minv, rhs, n, n)
        Gxt = matvec(G, xt, m, n)
        xn = alpha * xt + (1.0 - alpha) * x
        zt = alpha * Gxt + (1.0 - alpha) * z
        zn = jnp.clip(zt + y / rho_v[None, :], lov, hiv)
        yn = y + rho_v[None, :] * (zt - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(0, iters, it, (x0[0], z0[0], y0[0]))
    xo[0] = x
    zo[0] = z
    yo[0] = y


def _full_kernel(n: int, m: int, iters: int, sigma: float, alpha: float,
                 P, G, GT, q, lo, hi, rho, x0, z0, y0,
                 xo, zo, yo, po, do_,
                 M_ref, Y_ref, Mi_ref):
    """One FULL ADMM round in VMEM: M = P + sigma I + rho G'G, lanes
    Cholesky, explicit inverse via forward substitution (Minv = Y'Y with
    Y = L^-1), `iters` fused iterations, and the round residuals. The
    batched (B, n, n) Cholesky + cho_solve was 31% of the controller tick
    in XLA (PROFILE.md §2) — HBM-bound on this device; here it is a few
    hundred VMEM vector ops."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    rho_v = rho[0, 0, :]                       # (128,)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)   # rows
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)   # cols
    rvec_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)     # (n, 1)

    G0 = G[0]                                  # (m, n, 128)
    P0 = P[0]                                  # (n, n, 128)

    # --- M = P + sigma I + rho G'G ---
    def build_row(i, _):
        gi = G[0, :, pl.ds(i, 1), :]           # (m, 1, 128)
        gtg_i = jnp.sum(G0 * gi, axis=0)       # (n, 128)
        eye_i = (rvec_i == i).astype(f32)      # (n, 1)
        prow = jnp.sum(P[0, :, pl.ds(i, 1), :], axis=1)  # row i via (n,1,128)
        # P column i == row i (M symmetric); store M row i
        M_ref[pl.ds(i, 1)] = (
            prow + sigma * eye_i + rho_v[None, :] * gtg_i
        )[None]
        return _

    jax.lax.fori_loop(0, n, build_row, 0)

    # --- in-place lanes-Cholesky of M (lower) ---
    def chol_step(j, _):
        Mv = M_ref[:]                                        # (n, n, 128)
        colj = jnp.sum(jnp.where(col_i == j, Mv, 0.0), axis=1)   # (n, 128)
        diag = jnp.sum(jnp.where(rvec_i == j, colj, 0.0), axis=0)  # (128,)
        ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
        lcol = jnp.where(rvec_i > j, colj / ljj[None, :],
                         jnp.where(rvec_i == j, ljj[None, :], 0.0))
        # trailing update M[a, b] -= lcol[a] lcol[b] for a, b > j, then
        # write lcol into column j
        upd = lcol[:, None, :] * lcol[None, :, :]            # (n, n, 128)
        live = (row_i > j) & (col_i > j)
        Mnew = Mv - jnp.where(live, upd, 0.0)
        M_ref[:] = jnp.where(col_i == j, lcol[:, None, :], Mnew)
        return _

    jax.lax.fori_loop(0, n, chol_step, 0)

    # --- Y = L^-1 by forward substitution (Y starts as I) ---
    Y_ref[:] = (row_i == col_i).astype(f32) * jnp.ones((1, 1, LANES), f32)

    def fsub_step(j, _):
        Lv = M_ref[:]
        Yv = Y_ref[:]
        lrow = jnp.sum(jnp.where(row_i == j, Lv, 0.0), axis=0)   # (n, 128)
        ljj = jnp.sum(jnp.where(rvec_i == j, lrow, 0.0), axis=0)  # (128,)
        # S = sum_{k<j} L[j,k] Y[k, :]
        S = jnp.sum(
            jnp.where(rvec_i[:, :, None] < j, lrow[:, None, :] * Yv, 0.0),
            axis=0,
        )                                                    # (n, 128)
        ej = (rvec_i == j).astype(f32)                       # (n, 1)
        Y_ref[pl.ds(j, 1)] = ((ej - S) / ljj[None, :])[None]
        return _

    jax.lax.fori_loop(0, n, fsub_step, 0)

    # --- Minv = Y' Y ---
    def minv_row(i, _):
        Yv = Y_ref[:]
        ycol = jnp.sum(jnp.where(col_i == i, Yv, 0.0), axis=1)   # (n, 128)
        Mi_ref[pl.ds(i, 1)] = jnp.sum(ycol[:, None, :] * Yv, axis=0)[None]
        return _

    jax.lax.fori_loop(0, n, minv_row, 0)

    # --- fused iterations (same recurrence as _kernel) ---
    Minv = Mi_ref[:]
    GTv = GT[0]
    qv = q[0]
    lov = lo[0]
    hiv = hi[0]

    def matvec(Mat, v):
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def it(_, carry):
        x, z, y = carry
        t = rho_v[None, :] * z - y
        rhs = sigma * x - qv + matvec(GTv, t)
        xt = matvec(Minv, rhs)
        Gxt = matvec(G0, xt)
        xn = alpha * xt + (1.0 - alpha) * x
        zt = alpha * Gxt + (1.0 - alpha) * z
        zn = jnp.clip(zt + y / rho_v[None, :], lov, hiv)
        yn = y + rho_v[None, :] * (zt - zn)
        return xn, zn, yn

    x, z, y = jax.lax.fori_loop(0, iters, it, (x0[0], z0[0], y0[0]))

    # --- residuals for rho adaptation / reporting ---
    Gx = matvec(G0, x)
    prim = jnp.max(jnp.abs(Gx - z), axis=0)                  # (128,)
    Px = matvec(P0, x)
    Gty = matvec(GTv, y)
    dual = jnp.max(jnp.abs(Px + qv + Gty), axis=0)
    # relative scales (used by the OSQP rho rule outside)
    sGx = jnp.max(jnp.abs(Gx), axis=0)
    sz = jnp.max(jnp.abs(z), axis=0)
    sPx = jnp.max(jnp.abs(Px), axis=0)
    sq = jnp.max(jnp.abs(qv), axis=0)

    xo[0] = x
    zo[0] = z
    yo[0] = y
    po[0] = jnp.stack([prim, sGx, sz], axis=0)
    do_[0] = jnp.stack([dual, sPx, sq], axis=0)


def admm_round_full_pallas(
    P,      # (B, n, n) scaled
    G,      # (B, m, n) scaled
    q,      # (B, n)
    lo,     # (B, m)
    hi,     # (B, m)
    rho,    # (B,)
    x,      # (B, n)
    z,      # (B, m)
    y,      # (B, m)
    iters: int,
    sigma: float,
    alpha: float,
    interpret: bool = False,
):
    """One full ADMM round (factorization + iterations + residuals) as a
    single Pallas launch. Returns (x, z, y, prim, dual, scales) where
    scales = (sGx, sz, sPx, sq) feed the OSQP rho-adaptation rule."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = q.shape
    m = lo.shape[1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    Bt = B // LANES

    def t_mat(a, r, c):
        return a.reshape(Bt, LANES, r, c).transpose(0, 2, 3, 1)

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        t_mat(P, n, n),
        t_mat(G, m, n),
        t_mat(jnp.swapaxes(G, 1, 2), n, m),
        t_vec(q, n),
        t_vec(lo, m),
        t_vec(hi, m),
        rho.reshape(Bt, 1, LANES),
        t_vec(x, n),
        t_vec(z, m),
        t_vec(y, m),
    )

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)), spec((n, m, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((1, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
    ]
    out_specs = (
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((3, LANES)), spec((3, LANES)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 3, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 3, LANES), jnp.float32),
    )

    kern = functools.partial(
        _full_kernel, n, m, iters, float(sigma), float(alpha))
    xo, zo, yo, po, do_ = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), jnp.float32),   # M / L
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Y = L^-1
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Minv
        ],
        interpret=interpret,
    )(*[a.astype(jnp.float32) for a in ins])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)

    pr = u_vec(po, 3)
    du = u_vec(do_, 3)
    prim, sGx, sz = pr[:, 0], pr[:, 1], pr[:, 2]
    dual, sPx, sq = du[:, 0], du[:, 1], du[:, 2]
    return (u_vec(xo, n), u_vec(zo, m), u_vec(yo, m),
            prim, dual, (sGx, sz, sPx, sq))


def _multi_round_kernel(n: int, m: int, rounds: int, iters: int,
                        sigma: float, alpha: float,
                        P, G, q, lo, hi, rho0, x0, z0, y0,
                        xo, zo, yo, po,
                        M_ref, Y_ref, Mi_ref):
    """ALL ADMM rounds in one launch: per round — M = P + sigma I + rho G'G,
    lanes-Cholesky, explicit inverse, `iters` fused iterations, residuals —
    with the OSQP rho-adaptation rule applied IN-KERNEL between rounds.
    Versus one launch per round this loads P/G once instead of `rounds`
    times (the per-round streaming was 137 MB at B=4096, PROFILE_r03) and
    needs no GT input: the transposed matvec reduces over the row axis."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    row_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    rvec_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    G0 = G[0]                                  # (m, n, 128)
    P0 = P[0]                                  # (n, n, 128)
    qv = q[0]
    lov = lo[0]
    hiv = hi[0]

    def mv(Mat, v):
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def mvT(Mat, w):
        return jnp.sum(Mat * w[:, None, :], axis=0)

    def round_body(_, carry):
        x, z, y, rho_v = carry

        # --- M = P + sigma I + rho G'G ---
        def build_row(i, c):
            gi = G[0, :, pl.ds(i, 1), :]           # (m, 1, 128)
            gtg_i = jnp.sum(G0 * gi, axis=0)       # (n, 128)
            eye_i = (rvec_i == i).astype(f32)      # (n, 1)
            prow = jnp.sum(P[0, :, pl.ds(i, 1), :], axis=1)
            M_ref[pl.ds(i, 1)] = (
                prow + sigma * eye_i + rho_v[None, :] * gtg_i
            )[None]
            return c

        jax.lax.fori_loop(0, n, build_row, 0)

        # --- in-place lanes-Cholesky of M (lower), panelized ---
        _chol_inplace_panel(M_ref, n)

        # --- Y = L^-1, Minv = Y' Y (triangular-aware static slices) ---
        _tri_inverse_fsub(M_ref, Y_ref, n)
        _gram_from_y(Y_ref, Mi_ref, n)

        # --- fused iterations ---
        Minv = Mi_ref[:]

        def it(_, c):
            x, z, y = c
            t = rho_v[None, :] * z - y
            rhs = sigma * x - qv + mvT(G0, t)
            xt = mv(Minv, rhs)
            Gxt = mv(G0, xt)
            xn = alpha * xt + (1.0 - alpha) * x
            zt = alpha * Gxt + (1.0 - alpha) * z
            zn = jnp.clip(zt + y / rho_v[None, :], lov, hiv)
            yn = y + rho_v[None, :] * (zt - zn)
            return xn, zn, yn

        x, z, y = jax.lax.fori_loop(0, iters, it, (x, z, y))

        # --- residuals + in-kernel OSQP rho rule ---
        Gx = mv(G0, x)
        prim = jnp.max(jnp.abs(Gx - z), axis=0)                # (128,)
        Px = mv(P0, x)
        dual = jnp.max(jnp.abs(Px + qv + mvT(G0, y)), axis=0)
        prim_rel = prim / jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(Gx), axis=0), jnp.max(jnp.abs(z), axis=0)), 1e-6)
        dual_rel = dual / jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(Px), axis=0), jnp.max(jnp.abs(qv), axis=0)), 1e-6)
        rho_n = jnp.clip(
            rho_v * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)),
            1e-6, 1e6,
        )
        return x, z, y, rho_n, prim, dual

    def outer(r, carry):
        x, z, y, rho_v, _, _ = carry
        x, z, y, rho_n, prim, dual = round_body(r, (x, z, y, rho_v))
        return x, z, y, rho_n, prim, dual

    zero128 = jnp.zeros((LANES,), f32)
    x, z, y, rho_v, prim, dual = jax.lax.fori_loop(
        0, rounds, outer, (x0[0], z0[0], y0[0], rho0[0][0], zero128, zero128)
    )

    xo[0] = x
    zo[0] = z
    yo[0] = y
    po[0] = jnp.stack([prim, dual], axis=0)


def admm_all_rounds_pallas(
    P,      # (B, n, n) scaled
    G,      # (B, m, n) scaled
    q,      # (B, n)
    lo,     # (B, m)
    hi,     # (B, m)
    rho,    # (B,)
    x,      # (B, n)
    z,      # (B, m)
    y,      # (B, m)
    rounds: int,
    iters: int,
    sigma: float,
    alpha: float,
    interpret: bool = False,
):
    """The COMPLETE ADMM phase (all rounds, factorizations, iterations,
    residuals, rho adaptation) as a single Pallas launch. Returns
    (x, z, y, prim, dual) with prim/dual from the final round."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = q.shape
    m = lo.shape[1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    Bt = B // LANES

    def t_mat(a, r, c):
        return a.reshape(Bt, LANES, r, c).transpose(0, 2, 3, 1)

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        t_mat(P, n, n),
        t_mat(G, m, n),
        t_vec(q, n),
        t_vec(lo, m),
        t_vec(hi, m),
        rho.reshape(Bt, 1, LANES),
        t_vec(x, n),
        t_vec(z, m),
        t_vec(y, m),
    )

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((1, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
    ]
    out_specs = (
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((2, LANES)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 2, LANES), jnp.float32),
    )

    kern = functools.partial(
        _multi_round_kernel, n, m, int(rounds), int(iters),
        float(sigma), float(alpha))
    xo, zo, yo, po = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), jnp.float32),   # M / L
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Y = L^-1
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Minv
        ],
        interpret=interpret,
    )(*[a.astype(jnp.float32) for a in ins])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)

    pk = u_vec(po, 2)
    return (u_vec(xo, n), u_vec(zo, m), u_vec(yo, m), pk[:, 0], pk[:, 1])


def _ruiz_admm_kernel(n: int, m: int, ruiz_iters: int, max_checks: int,
                      check_iters: int, sigma: float, alpha: float,
                      conv_eps: float, band: float,
                      stall_cap: float, stall_ratio: float,
                      P, G, q, lo, hi, xw, yw, rho_in,
                      xo, yo, po,
                      Ps_ref, Gs_ref, M_ref, Y_ref, Mi_ref):
    """Ruiz equilibration + the complete ADMM phase on UNSCALED inputs,
    with warm starting and residual-driven adaptive iteration.

    The modified-Ruiz recurrence (``mpc/qp.py::_ruiz_equilibrate``) runs
    in-kernel without materializing scaled matrices: |Ps| column maxima
    factor as c * d_j * max_i(d_i |P[i,j]|), so each iteration is two
    broadcast-reduce passes over P and G. The scaled Ps/Gs are written to
    VMEM scratch once at the end; x/y are unscaled before the final store.

    Iteration control (round-5): up to ``max_checks`` blocks of
    ``check_iters`` fused iterations run under a ``lax.while_loop``; after
    each block the kernel computes the relative primal/dual residuals and
    - exits early once EVERY lane satisfies both < ``conv_eps``
      (``conv_eps == 0`` disables — fixed budget, the round-4 behavior),
    - applies the OSQP rho rule, but refactorizes (M build + lanes
      Cholesky + explicit inverse, under ``pl.when``) only when some
      lane's suggested rho drifted outside ``[1/band, band]`` of the
      factored rho (``band <= 1`` -> refactor every block, the round-4
      behavior). This is OSQP's direct-solver rho policy.

    Warm start: xw/yw are an UNSCALED primal/dual guess (zeros = cold) and
    ``rho_in`` the starting rho — in closed-loop MPC the previous control
    tick's solution (reference intent: ``main/lib/mpc.py:222-224``, which
    warm-starts the linearization controls the same way). z is re-derived
    in-kernel as clip(Gs xs, lo, hi), so the carried state is just (x, y,
    rho). With cold inputs the math is identical to the round-4 kernel."""
    f32 = jnp.float32
    x, y, prim, dual, rho_f, checks_v = _ruiz_admm_body(
        n, m, ruiz_iters, max_checks, check_iters, sigma, alpha,
        conv_eps, band, stall_cap, stall_ratio,
        P[0], G[0], q[0], lo[0], hi[0], xw[0], yw[0], rho_in[0][0],
        Ps_ref, Gs_ref, M_ref, Y_ref, Mi_ref)
    xo[0] = x
    yo[0] = y
    po[0] = jnp.stack([prim, dual, rho_f, checks_v], axis=0)


def _ruiz_admm_body(n, m, ruiz_iters, max_checks, check_iters, sigma, alpha,
                    conv_eps, band, stall_cap, stall_ratio,
                    P0, G0, qv, lo0, hi0, xw0, yw0, rho0_v,
                    Ps_ref, Gs_ref, M_ref, Y_ref, Mi_ref):
    """Ruiz + the adaptive warm-started ADMM phase over VMEM values/refs
    (shared by the standalone launch and the fused solve+polish kernel).
    Returns UNSCALED (x (n,128), y (m,128), prim, dual, rho_f, checks)."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    rvec_i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    eps = f32(1e-8)

    absP = jnp.abs(P0)
    absG = jnp.abs(G0)

    def ruiz_body(_, carry):
        d, e, c = carry                        # (n,128), (m,128), (128,)
        # column maxima of |Ps| and |Gs|, scale factored out
        colP = c[None, :] * d * jnp.max(d[:, None, :] * absP, axis=0)
        colG = d * jnp.max(e[:, None, :] * absG, axis=0)
        col_x = jnp.maximum(colP, colG)        # (n, 128)
        row_y = e * jnp.max(d[None, :, :] * absG, axis=1)   # (m, 128)
        d = d / jnp.sqrt(jnp.maximum(col_x, eps))
        e = e / jnp.sqrt(jnp.maximum(row_y, eps))
        # cost normalization with the updated d
        colP2 = c[None, :] * d * jnp.max(d[:, None, :] * absP, axis=0)
        qs_abs = jnp.abs(c[None, :] * d * qv)
        g = jnp.maximum(jnp.mean(colP2, axis=0), jnp.max(qs_abs, axis=0))
        c = c / jnp.maximum(g, eps)
        return d, e, c

    ones_n = jnp.ones((n, LANES), f32)
    ones_m = jnp.ones((m, LANES), f32)
    d, e, c = jax.lax.fori_loop(
        0, ruiz_iters, ruiz_body,
        (ones_n, ones_m, jnp.ones((LANES,), f32)),
    )

    Ps_ref[:] = c[None, None, :] * d[:, None, :] * d[None, :, :] * P0
    Gs_ref[:] = e[:, None, :] * d[None, :, :] * G0
    qs = c[None, :] * d * qv
    los = e * lo0
    his = e * hi0

    Psv = Ps_ref[:]
    Gsv = Gs_ref[:]

    def mv(Mat, v):
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def mvT(Mat, w):
        return jnp.sum(Mat * w[:, None, :], axis=0)

    def factorize(rho_v):
        """M = Ps + sigma I + rho Gs'Gs -> lanes Cholesky -> Minv."""
        def build_row(i, cc):
            gi = Gs_ref[:, pl.ds(i, 1), :]                   # (m, 1, 128)
            gtg_i = jnp.sum(Gsv * gi, axis=0)                # (n, 128)
            eye_i = (rvec_i == i).astype(f32)
            # column i of Ps == row i (symmetric)
            prow = jnp.sum(Ps_ref[:, pl.ds(i, 1), :], axis=1)
            M_ref[pl.ds(i, 1)] = (
                prow + sigma * eye_i + rho_v[None, :] * gtg_i
            )[None]
            return cc

        jax.lax.fori_loop(0, n, build_row, 0)

        # panelized lanes-Cholesky (~3x less work than full masked updates;
        # downstream reads mask to the lower triangle), then Y = L^-1 and
        # Minv = Y'Y with triangular-aware static slices
        _chol_inplace_panel(M_ref, n)
        _tri_inverse_fsub(M_ref, Y_ref, n)
        _gram_from_y(Y_ref, Mi_ref, n)

    # warm start, scaled into the equilibrated problem
    x0 = xw0 / d
    y0 = (c[None, :] * yw0) / e
    z0 = jnp.clip(mv(Gsv, x0), los, his)

    # Per-LANE adaptive policy, exactly mirroring the per-scenario XLA
    # twin under vmap (tested equivalence engine-fleet vs vmapped-engine
    # depends on it): each lane freezes its iterate the moment IT
    # converges, tracks its own rho, and refactorizes on its own drift.
    # The factorization is lanes-parallel math, so a group rebuild (fired
    # when ANY lane wants one) recomputes unchanged lanes bit-identically.
    # NOTE: the convergence / refactorization masks ride the carry as f32
    # (0/1) vectors — Mosaic cannot legalize vector<i1> while-carries
    # ("failed to legalize operation 'scf.yield'")
    def check_cond(carry):
        (k, x, z, y, rho_f, rho_p, refac_f, conv_f,
         prim, dual, checks_v, prev_score) = carry
        return (k < max_checks) & (jnp.min(conv_f) < 0.5)

    def check_body(carry):
        (k, x, z, y, rho_f, rho_p, refac_f, conv_f,
         prim, dual, checks_v, prev_score) = carry
        refac_v = refac_f > 0.5
        conv = conv_f > 0.5

        rho_v = jnp.where(refac_v, rho_p, rho_f)

        @pl.when(jnp.max(refac_f) > 0.5)
        def _():
            factorize(rho_v)

        Minv = Mi_ref[:]
        checks_v = checks_v + (1.0 - conv_f)
        frz = conv[None, :]                    # freeze converged lanes

        def it(_, cc):
            x, z, y = cc
            t = rho_v[None, :] * z - y
            rhs = sigma * x - qs + mvT(Gsv, t)
            xt = mv(Minv, rhs)
            Gxt = mv(Gsv, xt)
            xn = alpha * xt + (1.0 - alpha) * x
            zt = alpha * Gxt + (1.0 - alpha) * z
            zn = jnp.clip(zt + y / rho_v[None, :], los, his)
            yn = y + rho_v[None, :] * (zt - zn)
            return (jnp.where(frz, x, xn), jnp.where(frz, z, zn),
                    jnp.where(frz, y, yn))

        x, z, y = jax.lax.fori_loop(0, check_iters, it, (x, z, y))

        Gx = mv(Gsv, x)
        prim_n = jnp.max(jnp.abs(Gx - z), axis=0)
        Px = mv(Psv, x)
        dual_n = jnp.max(jnp.abs(Px + qs + mvT(Gsv, y)), axis=0)
        prim = jnp.where(conv, prim, prim_n)
        dual = jnp.where(conv, dual, dual_n)
        prim_rel = prim / jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(Gx), axis=0), jnp.max(jnp.abs(z), axis=0)), 1e-6)
        dual_rel = dual / jnp.maximum(jnp.maximum(
            jnp.max(jnp.abs(Px), axis=0), jnp.max(jnp.abs(qs), axis=0)), 1e-6)
        rho_n = jnp.clip(
            rho_v * jnp.sqrt((prim_rel + 1e-12) / (dual_rel + 1e-12)),
            1e-6, 1e6,
        )
        rho_f = jnp.where(conv, rho_f, rho_v)
        rho_p = jnp.where(conv, rho_p, rho_n)
        score = jnp.maximum(prim_rel, dual_rel)
        if conv_eps > 0.0:
            conv_now = (prim_rel <= conv_eps) & (dual_rel <= conv_eps)
            if stall_cap > 0.0:
                # stall exit: ~10% of fp32 instances noise-floor above
                # eps and would otherwise pin their whole lane group at
                # the check cap (and its per-check refactorizations) —
                # once a lane is near-converged (<= stall_cap) and no
                # longer improving by 1/stall_ratio per block, stop and
                # let the polish finish the job (OSQP's polish plays the
                # same role after its fixed iteration budget)
                stalled = (score <= stall_cap) & (
                    score > stall_ratio * prev_score) & (prim <= 5e-3)
                conv_now = conv_now | stalled
            conv = conv | conv_now
        prev_score = jnp.where(conv, prev_score, score)
        if band > 1.0:
            ratio = rho_n / rho_v
            refac_v = ((ratio > band) | (ratio * band < 1.0)) & (
                jnp.logical_not(conv))
        else:
            refac_v = jnp.logical_not(conv)
        return (k + 1, x, z, y, rho_f, rho_p, refac_v.astype(f32),
                conv.astype(f32), prim, dual, checks_v, prev_score)

    # carry seeded from DATA (not constants): Mosaic lays out constant
    # vectors as lane-replicated, which then fails the while-carry layout
    # join against the loop body's non-replicated outputs ("Invalid
    # relayout ... replicated in destination but not in source")
    zero128 = rho0_v * 0.0
    carry0 = (
        jnp.asarray(0, jnp.int32), x0, z0, y0,
        rho0_v, rho0_v, zero128 + 1.0, zero128,
        zero128, zero128, zero128, zero128 + f32(1e30),
    )
    (k, x, z, y, rho_f, _, _, _, prim, dual, checks_v, _) = (
        jax.lax.while_loop(check_cond, check_body, carry0))

    # unscale back to the original problem
    return (d * x, (e * y) / c[None, :], prim, dual, rho_f, checks_v)


def ruiz_admm_all_rounds_pallas(
    P_l,    # (Bt, n, n, LANES) UNSCALED, lanes layout
    G_l,    # (Bt, m, n, LANES)
    q_l,    # (Bt, n, LANES)
    lo_l,   # (Bt, m, LANES)
    hi_l,   # (Bt, m, LANES)
    rounds: int,
    iters: int,
    rho0: float,
    sigma: float,
    alpha: float,
    ruiz_iters: int = 10,
    interpret: bool = False,
    warm=None,              # None | (x0 (B, n), y0 (B, m), rho_w (B,))
    eps: float = 0.0,       # relative residual early-exit tol (0 = off)
    refactor_band: float = 0.0,  # rho drift band (<= 1 = refactor always)
    stall_cap: float = 0.0,      # stall-exit score cap (0 = off)
    stall_ratio: float = 0.5,    # min per-block improvement factor
):
    """Ruiz + the complete ADMM phase on lanes-layout UNSCALED inputs.
    Returns (x (B, n), y (B, m), prim (B,), dual (B,), rho (B,),
    checks (B,)) with x/y already unscaled to the original problem;
    ``rho`` is the final (scaled-problem) penalty — carry it into the next
    tick's ``warm`` — and ``checks`` the number of ``iters``-sized blocks
    actually executed (early exit at ``eps``; see ``_ruiz_admm_kernel``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt, n = P_l.shape[0], P_l.shape[1]
    m = G_l.shape[1]
    B = Bt * LANES

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    if warm is None:
        xw = jnp.zeros((Bt, n, LANES), jnp.float32)
        yw = jnp.zeros((Bt, m, LANES), jnp.float32)
        rw = jnp.full((Bt, 1, LANES), float(rho0), jnp.float32)
    else:
        x0, y0, rho_w = warm
        xw = t_vec(x0, n)
        yw = t_vec(y0, m)
        rw = rho_w.reshape(Bt, 1, LANES)

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((1, LANES)),
    ]
    out_specs = (
        spec((n, LANES)), spec((m, LANES)), spec((4, LANES)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 4, LANES), jnp.float32),
    )

    kern = functools.partial(
        _ruiz_admm_kernel, n, m, int(ruiz_iters), int(rounds), int(iters),
        float(sigma), float(alpha), float(eps), float(refactor_band),
        float(stall_cap), float(stall_ratio))
    xo, yo, po = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Ps
            pltpu.VMEM((m, n, LANES), jnp.float32),   # Gs
            pltpu.VMEM((n, n, LANES), jnp.float32),   # M / L
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Y = L^-1
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Minv
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*[a.astype(jnp.float32)
        for a in (P_l, G_l, q_l, lo_l, hi_l, xw, yw, rw)])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)

    pk = u_vec(po, 4)
    return (u_vec(xo, n), u_vec(yo, m),
            pk[:, 0], pk[:, 1], pk[:, 2], pk[:, 3])


def _solve_polish_kernel(n: int, m: int, ruiz_iters: int, max_checks: int,
                         check_iters: int, sigma: float, alpha: float,
                         conv_eps: float, band: float,
                         stall_cap: float, stall_ratio: float,
                         act_tol_rel: float,
                         P, G, q, lo, hi, xw, yw, rho_in,
                         xo, yo, po,
                         Ps_ref, Gs_ref, M_ref, Y_ref, Mi_ref,
                         S_ref, X2_ref, Y2_ref, ok2_ref):
    """The ENTIRE solve as one launch: in-kernel Ruiz + warm-started
    adaptive ADMM (``_ruiz_admm_body``) immediately followed by the
    two-attempt active-set polish (``_polish_body``) on the same
    VMEM-resident inputs. Versus the two-launch pipeline this streams the
    (B, n, n) P and (B, m, n) G from HBM ONCE instead of twice (~78 MB/
    launch at B=4096) and skips the x/y/prim lanes->(B,...)->lanes
    round-trip between launches. Scratch reuse: M_ref doubles as the
    polish's Lp, Gs_ref (same (m, n, 128) shape) as Vt; the ADMM contents
    of both are dead once the phase returns."""
    f32 = jnp.float32
    x, y, prim, dual, rho_f, checks_v = _ruiz_admm_body(
        n, m, ruiz_iters, max_checks, check_iters, sigma, alpha,
        conv_eps, band, stall_cap, stall_ratio,
        P[0], G[0], q[0], lo[0], hi[0], xw[0], yw[0], rho_in[0][0],
        Ps_ref, Gs_ref, M_ref, Y_ref, Mi_ref)
    xp, yp, ok, prim_out = _polish_body(
        n, m, act_tol_rel, P[0], G, q[0], lo[0], hi[0], x, y, prim,
        Lp_ref=M_ref, Y_ref=Y_ref, Vt_ref=Gs_ref, S_ref=S_ref,
        X2_ref=X2_ref, Y2_ref=Y2_ref, ok2_ref=ok2_ref)
    xo[0] = xp
    yo[0] = yp
    po[0] = jnp.stack(
        [ok.astype(f32), prim_out, dual, rho_f, checks_v], axis=0)


def solve_polish_fused_pallas(
    P_l,    # (Bt, n, n, LANES) UNSCALED, lanes layout
    G_l,    # (Bt, m, n, LANES)
    q_l,    # (Bt, n, LANES)
    lo_l,   # (Bt, m, LANES)
    hi_l,   # (Bt, m, LANES)
    rounds: int,
    iters: int,
    rho0: float,
    sigma: float,
    alpha: float,
    ruiz_iters: int = 10,
    interpret: bool = False,
    warm=None,
    eps: float = 0.0,
    refactor_band: float = 0.0,
    stall_cap: float = 0.0,
    stall_ratio: float = 0.5,
    act_tol_rel: float = 1e-4,
):
    """One-launch Ruiz + adaptive ADMM + polish on lanes-layout UNSCALED
    inputs. Returns (x, y, ok, prim_out, dual, rho, checks), all (B, ...)
    unpadded by the caller; semantics identical to
    ``ruiz_admm_all_rounds_pallas`` + ``polish_select_pallas_lanes``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bt, n = P_l.shape[0], P_l.shape[1]
    m = G_l.shape[1]
    B = Bt * LANES

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    if warm is None:
        xw = jnp.zeros((Bt, n, LANES), jnp.float32)
        yw = jnp.zeros((Bt, m, LANES), jnp.float32)
        rw = jnp.full((Bt, 1, LANES), float(rho0), jnp.float32)
    else:
        x0, y0, rho_w = warm
        xw = t_vec(x0, n)
        yw = t_vec(y0, m)
        rw = rho_w.reshape(Bt, 1, LANES)

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((1, LANES)),
    ]
    out_specs = (
        spec((n, LANES)), spec((m, LANES)), spec((5, LANES)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 5, LANES), jnp.float32),
    )

    kern = functools.partial(
        _solve_polish_kernel, n, m, int(ruiz_iters), int(rounds),
        int(iters), float(sigma), float(alpha), float(eps),
        float(refactor_band), float(stall_cap), float(stall_ratio),
        float(act_tol_rel))
    xo, yo, po = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Ps
            pltpu.VMEM((m, n, LANES), jnp.float32),   # Gs / Vt
            pltpu.VMEM((n, n, LANES), jnp.float32),   # M / L / Lp
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Y
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Minv
            pltpu.VMEM((m, m, LANES), jnp.float32),   # S / chol(S)
            pltpu.VMEM((n, LANES), jnp.float32),      # attempt-2 x
            pltpu.VMEM((m, LANES), jnp.float32),      # attempt-2 y
            pltpu.VMEM((1, LANES), jnp.float32),      # attempt-2 ok
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*[a.astype(jnp.float32)
        for a in (P_l, G_l, q_l, lo_l, hi_l, xw, yw, rw)])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)

    pk = u_vec(po, 5)
    return (u_vec(xo, n), u_vec(yo, m), pk[:, 0] > 0.5, pk[:, 1],
            pk[:, 2], pk[:, 3], pk[:, 4])


def _tri_inverse_fsub(L_ref, Y_ref, size: int):
    """Y = L^-1 by forward substitution into Y_ref; row j of Y reads only
    rows < j (static slices under Python unroll: half the masked work)."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    row_i = jax.lax.broadcasted_iota(jnp.int32, (size, 1, 1), 0)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, size, 1), 1)
    rvec = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0)
    Y_ref[:] = (row_i == col_i).astype(f32) * jnp.ones((1, 1, LANES), f32)
    for j in range(size):
        lrow = L_ref[pl.ds(j, 1), :, :][0]                  # (size, 128)
        ljj = jnp.sum(jnp.where(rvec == j, lrow, 0.0), axis=0)
        ej = (rvec == j).astype(f32)
        if j:
            Yv = Y_ref[pl.ds(0, j), :, :]                   # (j, size, 128)
            # NOTE: lrow[0:j, None, :] (slice + newaxis in one step) lowers
            # to a gather Mosaic rejects; slice first, then expand
            lpart = jnp.expand_dims(lrow[0:j], 1)           # (j, 1, 128)
            S = jnp.sum(lpart * Yv, axis=0)                 # (size, 128)
            Y_ref[pl.ds(j, 1)] = ((ej - S) / ljj[None, :])[None]
        else:
            Y_ref[pl.ds(j, 1)] = (ej / ljj[None, :])[None]


def _gram_from_y(Y_ref, out_ref, size: int):
    """out = Y' Y for lower-triangular Y: row i reads only rows >= i."""
    import jax.experimental.pallas as pl

    for i in range(size):
        rem = size - i
        Yp = Y_ref[pl.ds(i, rem), :, :]                     # (rem, size, 128)
        ycol = Y_ref[pl.ds(i, rem), pl.ds(i, 1), :][:, 0, :]  # (rem, 128)
        out_ref[pl.ds(i, 1)] = jnp.sum(ycol[:, None, :] * Yp, axis=0)[None]


def _polish_kernel(n: int, m: int, act_tol_rel: float,
                   P, G, q, lo, hi, x0, y0, prim0,
                   xo, yo, po,
                   Lp_ref, Y_ref, Vt_ref, S_ref, X2_ref, Y2_ref, ok2_ref):
    """Two-attempt active-set polish for 128 scenarios, entirely in VMEM.

    Thin launch wrapper around ``_polish_body`` (shared with the fused
    solve+polish kernel)."""
    f32 = jnp.float32
    x_out, y_out, ok, prim_out = _polish_body(
        n, m, act_tol_rel, P[0], G, q[0], lo[0], hi[0],
        x0[0], y0[0], prim0[0][0],
        Lp_ref, Y_ref, Vt_ref, S_ref, X2_ref, Y2_ref, ok2_ref)
    xo[0] = x_out
    yo[0] = y_out
    po[0] = jnp.stack([ok.astype(f32), prim_out], axis=0)


def _polish_body(n, m, act_tol_rel, P0, Gref, qv, lov, hiv, xin, yin,
                 prim_in,
                 Lp_ref, Y_ref, Vt_ref, S_ref, X2_ref, Y2_ref, ok2_ref):
    """Two-attempt active-set polish over VMEM values/refs.

    Semantic twin of ``mpc.qp._polish_and_select`` (the XLA path): factor P
    once (lanes-Cholesky + explicit L^-1 so P^-1 v = Y'(Y v) is two
    matvecs), build Vt = G Y' so the Schur matrix is S = D Vt Vt' D +
    (I - D), then per active-set guess one lanes-Cholesky of S and two
    KKT solves (initial + one iterative-refinement pass). The XLA polish
    was 46% of the controller tick (PROFILE.md round 3) — all batched
    (B, m, m) Cholesky + Gram HBM round-trips; here the per-128-scenario
    working set (~6.5 MB) never leaves VMEM. Returns
    (x_out (n,128), y_out (m,128), ok (128,) bool, prim_out (128,))."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    rvec_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    rvec_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    # Gref is a REF (leading block axis) — row slices of it feed the Vt
    # build without materializing gathers (Mosaic cannot ds VALUES)
    G0 = Gref[0]                                # (m, n, 128)

    def mv(Mat, v):      # (r, c, 128) @ (c, 128) -> (r, 128)
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def mvT(Mat, w):     # Mat' @ w: (r, c, 128), (r, 128) -> (c, 128)
        return jnp.sum(Mat * w[:, None, :], axis=0)

    def chol_inplace(ref, size, row_i, col_i, rvec_i):
        _chol_inplace_panel(ref, size)

    def chol_solve_vec(ref, size, rvec_i, b):
        """Solve (L L') s = b for one RHS; L in ref, b/result (size, 128)."""
        def fwd(j, w):
            lrow = ref[pl.ds(j, 1), :, :][0]                    # (size, 128)
            ljj = jnp.sum(jnp.where(rvec_i == j, lrow, 0.0), axis=0)
            s = jnp.sum(jnp.where(rvec_i < j, lrow * w, 0.0), axis=0)
            bj = jnp.sum(jnp.where(rvec_i == j, b, 0.0), axis=0)
            return jnp.where(rvec_i == j, ((bj - s) / ljj)[None, :], w)
        w = jax.lax.fori_loop(0, size, fwd, jnp.zeros_like(b))

        def bwd(i, s):
            j = size - 1 - i
            lcol = ref[:, pl.ds(j, 1), :][:, 0, :]              # (size, 128)
            ljj = jnp.sum(jnp.where(rvec_i == j, lcol, 0.0), axis=0)
            t = jnp.sum(jnp.where(rvec_i > j, lcol * s, 0.0), axis=0)
            sj = jnp.sum(jnp.where(rvec_i == j, s, 0.0), axis=0)
            return jnp.where(rvec_i == j, ((sj - t) / ljj)[None, :], s)
        return jax.lax.fori_loop(0, size, bwd, w)

    # --- factor P once: Lp = chol(P), Y = Lp^-1, Vt = G Y' ---
    Lp_ref[:] = P0
    chol_inplace(Lp_ref, n, row_n, col_n, rvec_n)
    _tri_inverse_fsub(Lp_ref, Y_ref, n)

    def pinv_apply(v):   # P^-1 v = Y' (Y v)
        Yv = Y_ref[:]
        return mvT(Yv, mv(Yv, v))

    def vt_row(j, _):
        grow = Gref[0, pl.ds(j, 1), :, :][0]                    # (n, 128)
        Vt_ref[pl.ds(j, 1)] = mv(Y_ref[:], grow)[None]
        return _

    jax.lax.fori_loop(0, m, vt_row, 0)

    # --- shared accept-test ingredients ---
    obj0 = 0.5 * jnp.sum(xin * mv(P0, xin), axis=0) + jnp.sum(qv * xin, axis=0)
    span = jnp.maximum(jnp.max(jnp.abs(hiv), axis=0), 1.0)      # (128,)
    Gx = mv(G0, xin)                                            # (m, 128)

    def attempt(act_lo, act_hi):
        d = (act_lo | act_hi).astype(f32)                       # (m, 128)
        b = jnp.where(act_lo, lov, hiv)

        # S = D Vt Vt' D + (I - D), built row-by-row
        def s_row(i, _):
            vrow = Vt_ref[pl.ds(i, 1), :, :][0]                 # (n, 128)
            hrow = mv(Vt_ref[:], vrow)                          # (m, 128)
            di = jnp.sum(jnp.where(rvec_m == i, d, 0.0), axis=0)
            eye_i = (rvec_m == i).astype(f32)
            S_ref[pl.ds(i, 1)] = (
                di[None, :] * hrow * d + eye_i * (1.0 - d)
            )[None]
            return _

        jax.lax.fori_loop(0, m, s_row, 0)
        # OSQP-style delta regularization (twin of ``_polish_masks``): a
        # degenerate active set makes S singular; without the ridge the
        # clamped-pivot lanes-Cholesky below would produce large finite
        # garbage rather than the NaN the XLA path produces (ADVICE r4
        # #2) — the ridge keeps both paths in the same well-posed regime
        # and the refinement pass recovers the accuracy.
        Sv = S_ref[:]
        diag = jnp.sum(jnp.where(row_m == col_m, Sv, 0.0), axis=1)  # (m,128)
        reg = 1e-7 * jnp.maximum(jnp.max(diag, axis=0), 1.0)        # (128,)
        S_ref[:] = Sv + jnp.where(
            row_m == col_m, reg[None, None, :], 0.0)
        chol_inplace(S_ref, m, row_m, col_m, rvec_m)

        def kkt_solve(r1, r2):
            Pir1 = pinv_apply(r1)
            dl = chol_solve_vec(S_ref, m, rvec_m, d * mv(G0, Pir1) - r2)
            dx = Pir1 - pinv_apply(mvT(G0, d * dl))
            return dx, dl

        xp, lam = kkt_solve(-qv, d * b)
        r1 = -(qv + mv(P0, xp) + mvT(G0, d * lam))
        r2 = d * (b - mv(G0, xp))
        dx, dl = kkt_solve(r1, r2)
        xp = xp + dx
        lam = lam + dl
        yp = d * lam

        Gxp = mv(G0, xp)
        viol = jnp.max(jnp.maximum(Gxp - hiv, lov - Gxp), axis=0)
        obj_p = (0.5 * jnp.sum(xp * mv(P0, xp), axis=0)
                 + jnp.sum(qv * xp, axis=0))
        finite = (jnp.all(xp - xp == 0.0, axis=0)
                  & jnp.all(yp - yp == 0.0, axis=0))
        ok = finite & (viol <= 1e-5 * span) & (
            obj_p <= obj0 + 1e-6 * jnp.abs(obj0) + 1e-6
        )
        return xp, yp, ok

    # attempt 1: dual-identified active set (the OSQP recipe)
    y_scale = jnp.maximum(jnp.max(jnp.abs(yin), axis=0), 1.0)
    tol = act_tol_rel * y_scale[None, :]
    act_lo1 = yin < -tol
    act_hi1 = yin > tol
    xp1, yp1, ok1 = attempt(act_lo1, act_hi1)

    # attempt 2: primal-proximity-identified active set — predicated on
    # some lane actually needing the rescue. A lane needs it only when
    # attempt 1 was rejected AND the primal-identified set differs from
    # the dual-identified one (equal sets reproduce attempt 1 bit-exactly,
    # so skipping them cannot change the result). With cross-tick warm
    # starts the ADMM duals are near-exact and the sets agree on almost
    # every lane, skipping the second S build + Cholesky + double KKT
    # solve on most production ticks.
    row_span = jnp.maximum(jnp.maximum(jnp.abs(lov), jnp.abs(hiv)), 1.0)
    ptol = 1e-3 * row_span
    near_lo = (Gx - lov <= ptol) & (Gx - lov <= hiv - Gx)
    near_hi = (hiv - Gx <= ptol) & (hiv - Gx < Gx - lov)
    same_set = jnp.all(
        (near_lo == act_lo1) & (near_hi == act_hi1), axis=0)     # (128,)
    need2 = jnp.logical_not(ok1) & jnp.logical_not(same_set)

    X2_ref[:] = xin
    Y2_ref[:] = yin
    ok2_ref[:] = jnp.zeros((1, LANES), f32)

    @pl.when(jnp.max(need2.astype(f32)) > 0.5)
    def _():
        xp2, yp2, ok2 = attempt(near_lo, near_hi)
        X2_ref[:] = xp2
        Y2_ref[:] = yp2
        ok2_ref[:] = ok2.astype(f32)[None, :]

    xp2 = X2_ref[:]
    yp2 = Y2_ref[:]
    ok2 = ok2_ref[:][0] > 0.5

    ok = ok1 | ok2
    x_out = jnp.where(ok1[None, :], xp1, jnp.where(ok2[None, :], xp2, xin))
    y_out = jnp.where(ok1[None, :], yp1, jnp.where(ok2[None, :], yp2, yin))

    Gx_out = mv(G0, x_out)
    viol_out = jnp.max(
        jnp.maximum(jnp.maximum(Gx_out - hiv, lov - Gx_out), 0.0), axis=0
    )
    prim_out = jnp.where(ok, viol_out, jnp.maximum(prim_in, viol_out))
    return x_out, y_out, ok, prim_out


def polish_select_pallas(
    P,      # (B, n, n) UNSCALED
    q,      # (B, n)
    G,      # (B, m, n)
    lo,     # (B, m)
    hi,     # (B, m)
    x,      # (B, n) unscaled ADMM primal
    y,      # (B, m) unscaled ADMM dual
    prim,   # (B,) pre-polish primal residual
    act_tol_rel: float = 1e-4,
    interpret: bool = False,
):
    """Two-attempt active-set polish + branchless select as one Pallas
    launch. Returns (x_out, y_out, ok, prim_out) with the exact
    ``_polish_and_select`` semantics."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = q.shape
    m = lo.shape[1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    Bt = B // LANES

    def t_mat(a, r, c):
        return a.reshape(Bt, LANES, r, c).transpose(0, 2, 3, 1)

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        t_mat(P, n, n),
        t_mat(G, m, n),
        t_vec(q, n),
        t_vec(lo, m),
        t_vec(hi, m),
        t_vec(x, n),
        t_vec(y, m),
        prim.reshape(Bt, 1, LANES),
    )
    return _polish_call(n, m, Bt, ins, act_tol_rel, interpret)


def polish_select_pallas_lanes(
    P_l,    # (Bt, n, n, LANES) UNSCALED, lanes layout
    G_l,    # (Bt, m, n, LANES)
    q_l,    # (Bt, n, LANES)
    lo_l,   # (Bt, m, LANES)
    hi_l,   # (Bt, m, LANES)
    x,      # (B, n) unscaled ADMM primal
    y,      # (B, m) unscaled ADMM dual
    prim,   # (B,)
    act_tol_rel: float = 1e-4,
    interpret: bool = False,
):
    """Lanes-layout twin of ``polish_select_pallas`` — the big QP tensors
    come straight from the lanes-layout condense/Ruiz pipeline with no
    intermediate (B, ...) transposes; only the small x/y/prim vectors are
    re-laid out."""
    Bt, n = P_l.shape[0], P_l.shape[1]
    m = G_l.shape[1]

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        P_l, G_l, q_l, lo_l, hi_l,
        t_vec(x, n), t_vec(y, m), prim.reshape(Bt, 1, LANES),
    )
    return _polish_call(n, m, Bt, ins, act_tol_rel, interpret)


def _polish_call(n, m, Bt, ins, act_tol_rel, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = Bt * LANES

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((1, LANES)),
    ]
    out_specs = (spec((n, LANES)), spec((m, LANES)), spec((2, LANES)))
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, 2, LANES), jnp.float32),
    )

    kern = functools.partial(_polish_kernel, n, m, float(act_tol_rel))
    xo, yo, po = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Lp
            pltpu.VMEM((n, n, LANES), jnp.float32),   # Y = Lp^-1
            pltpu.VMEM((m, n, LANES), jnp.float32),   # Vt = G Y'
            pltpu.VMEM((m, m, LANES), jnp.float32),   # S / chol(S)
            pltpu.VMEM((n, LANES), jnp.float32),      # attempt-2 x
            pltpu.VMEM((m, LANES), jnp.float32),      # attempt-2 y
            pltpu.VMEM((1, LANES), jnp.float32),      # attempt-2 ok
        ],
        # blocks + scratch + the S-Cholesky's full-matrix stack temps
        # exceed the 16 MB default scoped-VMEM budget at (n, m) = (40, 79);
        # v5e has 128 MB physical VMEM — raise the compiler cap instead of
        # shrinking the kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*[a.astype(jnp.float32) for a in ins])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)

    pk = u_vec(po, 2)
    ok = pk[:, 0] > 0.5
    prim_out = pk[:, 1]
    return u_vec(xo, n), u_vec(yo, m), ok, prim_out


def admm_iterations_pallas(
    Minv,   # (B, n, n)
    G,      # (B, m, n)
    q,      # (B, n)
    lo,     # (B, m)
    hi,     # (B, m)
    rho,    # (B,)
    x,      # (B, n)
    z,      # (B, m)
    y,      # (B, m)
    iters: int,
    sigma: float,
    alpha: float,
    interpret: bool = False,
):
    """Run `iters` ADMM iterations for B scenarios. B must be a multiple of
    128 (pad with duplicate rows if needed)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n = q.shape
    m = lo.shape[1]
    assert B % LANES == 0, f"batch {B} must be a multiple of {LANES}"
    Bt = B // LANES

    def t_mat(a, r, c):   # (B, r, c) -> (Bt, r, c, 128)
        return a.reshape(Bt, LANES, r, c).transpose(0, 2, 3, 1)

    def t_vec(a, r):      # (B, r) -> (Bt, r, 128)
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        t_mat(Minv, n, n),
        t_mat(G, m, n),
        t_mat(jnp.swapaxes(G, 1, 2), n, m),
        t_vec(q, n),
        t_vec(lo, m),
        t_vec(hi, m),
        rho.reshape(Bt, 1, LANES),
        t_vec(x, n),
        t_vec(z, m),
        t_vec(y, m),
    )

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((n, n, LANES)), spec((m, n, LANES)), spec((n, m, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((1, LANES)),
        spec((n, LANES)), spec((m, LANES)), spec((m, LANES)),
    ]
    out_specs = (spec((n, LANES)), spec((m, LANES)), spec((m, LANES)))
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
    )

    kern = functools.partial(_kernel, n, m, iters, float(sigma), float(alpha))
    xo, zo, yo = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*[a.astype(jnp.float32) for a in ins])

    def u_vec(a, r):      # (Bt, r, 128) -> (B, r)
        return a.transpose(0, 2, 1).reshape(B, r)

    return u_vec(xo, n), u_vec(zo, m), u_vec(yo, m)
