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
