"""Pallas TPU kernel: fused rollout + linearization + condensing.

After round 4 fused the ADMM rounds and the polish into kernels, the
controller tick's dominant stage became ``lin_cond`` — the nonlinear
operating rollout, closed-form bicycle linearization, and QP condensing
(66.8 ms of the 80 ms tick at B=4096, PROFILE_r04). In XLA that stage is
two T-step sequential scans over (B, 4, n) tensors plus batched
(80, 40)-sized matmuls that tile poorly onto the 128x128 MXU.

This kernel exploits the bicycle structure instead of dense algebra: with
the batch in the lane dimension, the prediction operator's four state rows
(x, y, v, yaw) are (n, 128) vectors advanced by ~8 fused multiply-adds per
step (the A_t matrix has only 6 non-identity entries at the canonical
deltabar=0 operating point, ``mpc/linearize.py``), and the tracking
Hessian accumulates as rank-1 outer products of those rows — everything
VMEM-resident, written out once as the finished (P, q, G, lo, hi, F, g).

Semantics: exact twin of ``plant_rollout`` -> ``linearize_bicycle`` ->
``mpc/condense.py::_condense_impl`` for the canonical nx=4 controller
(the jerk variant keeps the XLA path). Replaces the QP-build stage of the
reference's per-tick CVXPY program construction (``main/lib/mpc.py:148-191``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .admm_pallas import LANES


def _kernel(T: int, jerk: bool, consts: tuple,
            state, oa, od, xref, re,
            P_out, q_out, G_out, lo_out, hi_out, F_out, g_out):
    import jax.experimental.pallas as pl

    (dt, L, w_perp, w_para, q_v, q_yaw, qf0, qf1, qf2, qf3,
     end_w, r_accel, r_steer, rd_accel, rd_steer,
     min_speed, max_speed, max_decel, max_accel, max_steer, rate_lim,
     jerk_w) = consts

    f32 = jnp.float32
    n = 2 * T + 1 if jerk else 2 * T
    nx = 5 if jerk else 4
    m = 4 * T - 1
    rvec_n = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)

    st = state[0]                      # (4, 128)
    oav = oa[0]                        # (T, 128)
    odv = od[0]                        # (T, 128)
    xr_ref = xref[0]                   # (4 * (T + 1), 128) row-major (i, t)
    rev = re[0]                        # (T + 1, 128) 0/1

    def row(a, i):
        return a[i:i + 1, :][0]        # static slice of a VALUE -> (128,)

    v = row(st, 2)
    yaw = row(st, 3)

    # F rows (n, 128) and affine offsets (128,) — x_t = F_t u + g_t.
    # Jerk variant (nx=5, ``mpc/jerk.py::condense_jerk``): decision vector
    # [u_flat; a0], so the accel-state row starts as the a0 indicator; the
    # a-state's affine offset is identically zero (x0_5[4] = 0, C[4] = 0),
    # which collapses the jerk penalty to a static dt^2-diagonal (below).
    xr = jnp.zeros((n, LANES), f32)
    yr = jnp.zeros((n, LANES), f32)
    vr = jnp.zeros((n, LANES), f32)
    wr = jnp.zeros((n, LANES), f32)
    ar = (rvec_n == 2 * T).astype(f32) * jnp.ones((1, LANES), f32)
    gx = row(st, 0)
    gy = row(st, 1)
    gv = v
    gw = yaw

    P_acc = jnp.zeros((n, n, LANES), f32)
    q_acc = jnp.zeros((n, LANES), f32)

    for t in range(T):
        # linearization operating point = pre-update plant state
        vb = v
        cphi = jnp.cos(yaw)
        sphi = jnp.sin(yaw)
        phib = yaw

        # prediction-row advance (A_t has 6 non-identity entries; B_t two)
        xr_n = xr + dt * cphi[None, :] * vr - dt * (vb * sphi)[None, :] * wr
        yr_n = yr + dt * sphi[None, :] * vr + dt * (vb * cphi)[None, :] * wr
        ea = (rvec_n == 2 * t).astype(f32)
        ed = (rvec_n == 2 * t + 1).astype(f32)
        vr_n = vr + dt * ea + (dt * ar if jerk else 0.0)
        wr_n = wr + (dt / L) * vb[None, :] * ed
        gx_n = gx + dt * cphi * gv - dt * vb * sphi * gw + dt * vb * sphi * phib
        gy_n = gy + dt * sphi * gv + dt * vb * cphi * gw - dt * vb * cphi * phib
        # gv, gw rows of A are identity with zero C -> constant (jerk: gv
        # gains dt * ga per step, but ga stays 0)

        xr, yr, vr, wr, gx, gy = xr_n, yr_n, vr_n, wr_n, gx_n, gy_n
        if jerk:
            ar = ar + dt * ea          # a_{t+1} = a_t + dt u0_t

        # plant step (reference ordering quirk: pose uses pre-update v)
        delta = jnp.clip(row(odv, t), -max_steer, max_steer)
        yaw = yaw + (v / L) * jnp.tan(delta) * dt
        v = jnp.clip(v + row(oav, t) * dt, min_speed, max_speed)

        # write F / g rows for state t+1
        F_out[0, pl.ds(nx * t, 1)] = xr[None]
        F_out[0, pl.ds(nx * t + 1, 1)] = yr[None]
        F_out[0, pl.ds(nx * t + 2, 1)] = vr[None]
        F_out[0, pl.ds(nx * t + 3, 1)] = wr[None]
        g_out[0, pl.ds(nx * t, 1)] = gx[None]
        g_out[0, pl.ds(nx * t + 1, 1)] = gy[None]
        g_out[0, pl.ds(nx * t + 2, 1)] = gv[None]
        g_out[0, pl.ds(nx * t + 3, 1)] = gw[None]
        if jerk:
            F_out[0, pl.ds(nx * t + 4, 1)] = ar[None]
            g_out[0, pl.ds(nx * t + 4, 1)] = jnp.zeros((1, LANES), f32)

        # tracking cost block for slot t+1 (end-switch per lane)
        ryaw = row(xr_ref, 3 * (T + 1) + t + 1)
        end = row(rev, t + 1)
        c = jnp.cos(ryaw)
        s = jnp.sin(ryaw)
        qxx = jnp.where(end > 0.5, f32(qf0 * T), w_perp * s * s + w_para * c * c)
        qxy = jnp.where(end > 0.5, f32(0.0), (-w_perp + w_para) * c * s)
        qyy = jnp.where(end > 0.5, f32(qf1 * T), w_perp * c * c + w_para * s * s)
        qvv = jnp.where(end > 0.5, f32(qf2 * T), f32(q_v))
        qww = jnp.where(end > 0.5, f32(qf3 * T), f32(q_yaw))

        P_acc = (P_acc
                 + (qxx[None, :] * xr)[:, None, :] * xr[None, :, :]
                 + (qxy[None, :] * xr)[:, None, :] * yr[None, :, :]
                 + (qxy[None, :] * yr)[:, None, :] * xr[None, :, :]
                 + (qyy[None, :] * yr)[:, None, :] * yr[None, :, :]
                 + (qvv[None, :] * vr)[:, None, :] * vr[None, :, :]
                 + (qww[None, :] * wr)[:, None, :] * wr[None, :, :])

        dx = gx - row(xr_ref, t + 1)
        dy = gy - row(xr_ref, (T + 1) + t + 1)
        dv = gv - row(xr_ref, 2 * (T + 1) + t + 1)
        dw = gw - ryaw
        q_acc = (q_acc
                 + xr * (qxx * dx + qxy * dy)[None, :]
                 + yr * (qxy * dx + qyy * dy)[None, :]
                 + vr * (qvv * dv)[None, :]
                 + wr * (qww * dw)[None, :])

        # velocity constraint row t: vr for state t+1; bounds use gv
        G_out[0, pl.ds(t, 1)] = vr[None]
        lo_t = (min_speed - gv)
        hi_t = (max_speed - gv)
        lo_out[0, pl.ds(t, 1)] = lo_t[None]
        hi_out[0, pl.ds(t, 1)] = hi_t[None]

    # input cost diagonal (end-switch on reaches_end[0..T-1] per column)
    rdiag = jnp.zeros((n, LANES), f32)
    for t in range(T):
        end = row(rev, t)
        rdiag = jnp.where(rvec_n == 2 * t,
                          jnp.where(end > 0.5, f32(end_w), f32(r_accel))[None, :],
                          rdiag)
        rdiag = jnp.where(rvec_n == 2 * t + 1,
                          jnp.where(end > 0.5, f32(end_w), f32(r_steer))[None, :],
                          rdiag)

    # static patterns built from iotas (Mosaic kernels cannot capture
    # traced constants): input-rate Hessian Dm' Rd Dm, input-cost diagonal,
    # box/rate constraint rows. Masks address the u block (cols < 2T)
    # explicitly so the jerk variant's trailing a0 column stays untouched
    # (for n = 2T they reduce to the canonical patterns).
    ub = 2 * T
    I3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    J3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    rd_I = jnp.where(I3 % 2 == 0, f32(rd_accel), f32(rd_steer))
    diag_val = (rd_I * (I3 <= ub - 3).astype(f32)
                + rd_I * ((I3 >= 2) & (I3 < ub)).astype(f32))
    Prate = (jnp.where(I3 == J3, diag_val, 0.0)
             + jnp.where(((J3 == I3 + 2) | (J3 == I3 - 2)) & (I3 < ub)
                         & (J3 < ub), -rd_I, 0.0))
    if jerk:
        # jerk penalty sum_t (a_{t+1} - a_t)^2, t < T-1: the a-state rows
        # difference collapses to dt * e_{2t} (a_{t+1} = a_t + dt u0_t and
        # the affine part is identically zero), i.e. a static diagonal
        Prate = Prate + jnp.where(
            (I3 == J3) & (I3 <= ub - 4) & (I3 % 2 == 0),
            f32(jerk_w * dt * dt), 0.0)

    P_out[0] = 2.0 * (P_acc
                      + jnp.where(I3 == J3, 1.0, 0.0) * rdiag[:, None, :]
                      + Prate)
    q_out[0] = 2.0 * q_acc

    # constraint rows T..m-1: accel box (1 at col 2r), steer box (1 at col
    # 2(r-T)+1), steer-rate differences (-1 / +1 at cols 2j+1 / 2j+3)
    ms = m - T
    R3 = jax.lax.broadcasted_iota(jnp.int32, (ms, n, 1), 0)
    C3 = jax.lax.broadcasted_iota(jnp.int32, (ms, n, 1), 1)
    acc_r = (R3 < T) & (C3 == 2 * R3)
    steer_r = (R3 >= T) & (R3 < 2 * T) & (C3 == 2 * (R3 - T) + 1)
    rate_m = (R3 >= 2 * T) & (C3 == 2 * (R3 - 2 * T) + 1)
    rate_p = (R3 >= 2 * T) & (C3 == 2 * (R3 - 2 * T) + 3)
    G_static = (acc_r.astype(f32) + steer_r.astype(f32)
                - rate_m.astype(f32) + rate_p.astype(f32))

    rvec_ms = jax.lax.broadcasted_iota(jnp.int32, (ms, 1), 0)
    lo_static = jnp.where(
        rvec_ms < T, f32(max_decel),
        jnp.where(rvec_ms < 2 * T, f32(-max_steer), f32(-rate_lim)))
    hi_static = jnp.where(
        rvec_ms < T, f32(max_accel),
        jnp.where(rvec_ms < 2 * T, f32(max_steer), f32(rate_lim)))

    ones = jnp.ones((1, LANES), f32)
    G_out[0, pl.ds(T, ms)] = G_static * jnp.ones((1, 1, LANES), f32)
    lo_out[0, pl.ds(T, ms)] = lo_static * ones
    hi_out[0, pl.ds(T, ms)] = hi_static * ones


@jax.tree_util.register_pytree_node_class
class LanesQP:
    """Condensed QP with the big tensors kept in the kernel-native lanes
    layout (Bt, rows, cols, 128) — fed directly to the lanes-input solver
    kernels with zero intermediate (B, ...) transposes. F/g stay (B, ...)
    for the XLA epilogue. Registered as a pytree with the static unpadded
    batch size B0 as aux data so it can cross jit boundaries."""

    __slots__ = ("P_l", "q_l", "G_l", "lo_l", "hi_l", "F", "g", "B0")

    def __init__(self, P_l, q_l, G_l, lo_l, hi_l, F, g, B0):
        self.P_l, self.q_l, self.G_l = P_l, q_l, G_l
        self.lo_l, self.hi_l = lo_l, hi_l
        self.F, self.g, self.B0 = F, g, B0

    def tree_flatten(self):
        return ((self.P_l, self.q_l, self.G_l, self.lo_l, self.hi_l,
                 self.F, self.g), self.B0)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)


def build_qp_pallas(
    states,        # (B, 4)
    oa,            # (B, T)
    od,            # (B, T)
    xref,          # (B, 4, T+1)
    reaches_end,   # (B, T+1) bool
    cfg,           # MPCConfig (canonical, nx=4)
    wheelbase: float,
    interpret: bool = False,
    lanes_out: bool = False,
):
    """Fused rollout+linearize+condense for a batch (canonical nx=4 and
    the jerk nx=5 variant — ``mpc/jerk.py::condense_jerk`` semantics, with
    the extra a0 decision column and the jerk diagonal). Returns a
    CondensedQP with fields in the standard (B, ...) layout, or a LanesQP
    (big tensors left in lanes layout) when ``lanes_out``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..mpc.condense import CondensedQP

    jerk = bool(cfg.jerk)
    T = cfg.T
    n = 2 * T + 1 if jerk else 2 * T
    nx = cfg.nx
    m = 4 * T - 1
    B0 = states.shape[0]
    pad = (LANES - B0 % LANES) % LANES
    if pad:
        def padd(a):
            return jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], 0)

        states, oa, od, xref, reaches_end = map(
            padd, (states, oa, od, xref, reaches_end))
    B = states.shape[0]
    Bt = B // LANES
    dtype = states.dtype

    consts = (
        float(cfg.dt), float(wheelbase), float(cfg.w_perp), float(cfg.w_para),
        float(cfg.q_v), float(cfg.q_yaw),
        float(cfg.qf[0]), float(cfg.qf[1]), float(cfg.qf[2]), float(cfg.qf[3]),
        float(cfg.end_input_weight), float(cfg.r_accel), float(cfg.r_steer),
        float(cfg.rd_accel), float(cfg.rd_steer),
        float(cfg.min_speed), float(cfg.max_speed),
        float(cfg.max_decel), float(cfg.max_accel), float(cfg.max_steer),
        float(cfg.max_dsteer) * float(cfg.dt),
        float(cfg.jerk_weight),
    )

    def t_vec(a, r):
        return a.reshape(Bt, LANES, r).transpose(0, 2, 1)

    ins = (
        t_vec(states, 4),
        t_vec(oa, T),
        t_vec(od, T),
        t_vec(xref.reshape(B, 4 * (T + 1)), 4 * (T + 1)),
        t_vec(reaches_end.astype(jnp.float32), T + 1),
    )

    def spec(shape):
        return pl.BlockSpec(
            (1,) + shape, lambda b: (b,) + (0,) * len(shape),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        spec((4, LANES)), spec((T, LANES)), spec((T, LANES)),
        spec((4 * (T + 1), LANES)), spec((T + 1, LANES)),
    ]
    out_specs = (
        spec((n, n, LANES)), spec((n, LANES)),
        spec((m, n, LANES)), spec((m, LANES)), spec((m, LANES)),
        spec((T * nx, n, LANES)), spec((T * nx, LANES)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bt, n, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, m, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, T * nx, n, LANES), jnp.float32),
        jax.ShapeDtypeStruct((Bt, T * nx, LANES), jnp.float32),
    )

    kern = functools.partial(_kernel, T, jerk, consts)
    P, q, G, lo, hi, F, g = pl.pallas_call(
        kern,
        grid=(Bt,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*[a.astype(jnp.float32) for a in ins])

    def u_vec(a, r):
        return a.transpose(0, 2, 1).reshape(B, r)[:B0].astype(dtype)

    def u_mat(a, r, c):
        return a.transpose(0, 3, 1, 2).reshape(B, r, c)[:B0].astype(dtype)

    if lanes_out:
        return LanesQP(
            P_l=P, q_l=q, G_l=G, lo_l=lo, hi_l=hi,
            F=u_mat(F, T * nx, n), g=u_vec(g, T * nx), B0=B0,
        )

    return CondensedQP(
        P=u_mat(P, n, n), q=u_vec(q, n),
        G=u_mat(G, m, n), lo=u_vec(lo, m), hi=u_vec(hi, m),
        F=u_mat(F, T * nx, n), g=u_vec(g, T * nx),
    )
