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
