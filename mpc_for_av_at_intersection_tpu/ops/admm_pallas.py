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

        # --- in-place lanes-Cholesky of M (lower) ---
        def chol_step(j, c):
            Mv = M_ref[:]
            colj = jnp.sum(jnp.where(col_i == j, Mv, 0.0), axis=1)
            diag = jnp.sum(jnp.where(rvec_i == j, colj, 0.0), axis=0)
            ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
            lcol = jnp.where(rvec_i > j, colj / ljj[None, :],
                             jnp.where(rvec_i == j, ljj[None, :], 0.0))
            upd = lcol[:, None, :] * lcol[None, :, :]
            live = (row_i > j) & (col_i > j)
            Mnew = Mv - jnp.where(live, upd, 0.0)
            M_ref[:] = jnp.where(col_i == j, lcol[:, None, :], Mnew)
            return c

        jax.lax.fori_loop(0, n, chol_step, 0)

        # --- Y = L^-1 by forward substitution ---
        Y_ref[:] = (row_i == col_i).astype(f32) * jnp.ones((1, 1, LANES), f32)

        def fsub_step(j, c):
            Yv = Y_ref[:]
            lrow = M_ref[pl.ds(j, 1), :, :][0]                 # (n, 128)
            ljj = jnp.sum(jnp.where(rvec_i == j, lrow, 0.0), axis=0)
            S = jnp.sum(
                jnp.where(rvec_i[:, :, None] < j, lrow[:, None, :] * Yv, 0.0),
                axis=0,
            )
            ej = (rvec_i == j).astype(f32)
            Y_ref[pl.ds(j, 1)] = ((ej - S) / ljj[None, :])[None]
            return c

        jax.lax.fori_loop(0, n, fsub_step, 0)

        # --- Minv = Y' Y ---
        def minv_row(i, c):
            Yv = Y_ref[:]
            yrow = Y_ref[:, pl.ds(i, 1), :][:, 0, :]           # column i of Y
            Mi_ref[pl.ds(i, 1)] = jnp.sum(yrow[:, None, :] * Yv, axis=0)[None]
            return c

        jax.lax.fori_loop(0, n, minv_row, 0)

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


def _polish_kernel(n: int, m: int, act_tol_rel: float,
                   P, G, q, lo, hi, x0, y0, prim0,
                   xo, yo, po,
                   Lp_ref, Y_ref, Vt_ref, S_ref):
    """Two-attempt active-set polish for 128 scenarios, entirely in VMEM.

    Semantic twin of ``mpc.qp._polish_and_select`` (the XLA path): factor P
    once (lanes-Cholesky + explicit L^-1 so P^-1 v = Y'(Y v) is two
    matvecs), build Vt = G Y' so the Schur matrix is S = D Vt Vt' D +
    (I - D), then per active-set guess one lanes-Cholesky of S and two
    KKT solves (initial + one iterative-refinement pass). The XLA polish
    was 46% of the controller tick (PROFILE.md round 3) — all batched
    (B, m, m) Cholesky + Gram HBM round-trips; here the per-128-scenario
    working set (~6.5 MB) never leaves VMEM."""
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    row_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)
    col_n = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)
    rvec_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    row_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    col_m = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
    rvec_m = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    P0 = P[0]                                   # (n, n, 128)
    G0 = G[0]                                   # (m, n, 128)
    qv = q[0]                                   # (n, 128)
    lov = lo[0]
    hiv = hi[0]
    xin = x0[0]
    yin = y0[0]
    prim_in = prim0[0][0]                       # (128,)

    def mv(Mat, v):      # (r, c, 128) @ (c, 128) -> (r, 128)
        return jnp.sum(Mat * v[None, :, :], axis=1)

    def mvT(Mat, w):     # Mat' @ w: (r, c, 128), (r, 128) -> (c, 128)
        return jnp.sum(Mat * w[:, None, :], axis=0)

    def chol_inplace(ref, size, row_i, col_i, rvec_i):
        """In-place lanes-Cholesky (lower); same recipe as _full_kernel."""
        def step(j, carry):
            Mv = ref[:]
            colj = jnp.sum(jnp.where(col_i == j, Mv, 0.0), axis=1)
            diag = jnp.sum(jnp.where(rvec_i == j, colj, 0.0), axis=0)
            ljj = jnp.sqrt(jnp.maximum(diag, 1e-30))
            lcol = jnp.where(rvec_i > j, colj / ljj[None, :],
                             jnp.where(rvec_i == j, ljj[None, :], 0.0))
            upd = lcol[:, None, :] * lcol[None, :, :]
            live = (row_i > j) & (col_i > j)
            Mnew = Mv - jnp.where(live, upd, 0.0)
            ref[:] = jnp.where(col_i == j, lcol[:, None, :], Mnew)
            return carry
        jax.lax.fori_loop(0, size, step, 0)

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

    Y_ref[:] = (row_n == col_n).astype(f32) * jnp.ones((1, 1, LANES), f32)

    def fsub_step(j, _):
        Yv = Y_ref[:]
        lrow = Lp_ref[pl.ds(j, 1), :, :][0]                     # (n, 128)
        ljj = jnp.sum(jnp.where(rvec_n == j, lrow, 0.0), axis=0)
        S_ = jnp.sum(
            jnp.where(rvec_n[:, :, None] < j, lrow[:, None, :] * Yv, 0.0),
            axis=0,
        )
        ej = (rvec_n == j).astype(f32)
        Y_ref[pl.ds(j, 1)] = ((ej - S_) / ljj[None, :])[None]
        return _

    jax.lax.fori_loop(0, n, fsub_step, 0)

    def pinv_apply(v):   # P^-1 v = Y' (Y v)
        Yv = Y_ref[:]
        return mvT(Yv, mv(Yv, v))

    def vt_row(j, _):
        grow = G[0, pl.ds(j, 1), :, :][0]                       # (n, 128)
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
    xp1, yp1, ok1 = attempt(yin < -tol, yin > tol)

    # attempt 2: primal-proximity-identified active set
    row_span = jnp.maximum(jnp.maximum(jnp.abs(lov), jnp.abs(hiv)), 1.0)
    ptol = 1e-3 * row_span
    near_lo = (Gx - lov <= ptol) & (Gx - lov <= hiv - Gx)
    near_hi = (hiv - Gx <= ptol) & (hiv - Gx < Gx - lov)
    xp2, yp2, ok2 = attempt(near_lo, near_hi)

    ok = ok1 | ok2
    x_out = jnp.where(ok1[None, :], xp1, jnp.where(ok2[None, :], xp2, xin))
    y_out = jnp.where(ok1[None, :], yp1, jnp.where(ok2[None, :], yp2, yin))

    Gx_out = mv(G0, x_out)
    viol_out = jnp.max(
        jnp.maximum(jnp.maximum(Gx_out - hiv, lov - Gx_out), 0.0), axis=0
    )
    prim_out = jnp.where(ok, viol_out, jnp.maximum(prim_in, viol_out))

    xo[0] = x_out
    yo[0] = y_out
    po[0] = jnp.stack([ok.astype(f32), prim_out], axis=0)


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
