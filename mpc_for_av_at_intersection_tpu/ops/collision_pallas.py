"""Pallas TPU kernel: fused frontier x primitive half-plane collision check.

The XLA wavefront path (lattice/wavefront.py) evaluates every half-plane at
every collision point of every (frontier cell, primitive) candidate as a
5-D broadcast ``(F, P, C, O, H)`` — correct, but it round-trips tens of MB
of intermediates through HBM per search iteration and dominated device
planning time. This kernel keeps the whole violation tensor in VMEM:

- half-plane rows live in the SUBLANE dimension (``OH = O_pad * 8`` rows,
  one 8-row sublane group per obstacle, matching ``compile_scenario``'s
  ``max_halfplanes=8`` padding);
- the ``F_blk * PC`` candidate collision points live in the LANE dimension;
- "inside obstacle = all rows <= 0" is a free sublane-group reshape
  ``(OH, ...) -> (O, 8, ...)`` + max (padded rows are ``[0,0,-1]``: always
  satisfied; padded obstacle slots are masked by ``valid_col``);
- "candidate collides = any collision point inside any obstacle" is one
  small MXU matmul against a static point->primitive grouping matrix
  (which also folds in the per-primitive collision-point validity mask).

Everything is a single launch per (scenario, frontier block): zero HBM
intermediates. Used by ``wavefront_search`` when running on TPU; the XLA
broadcast stays as the CPU/interpret fallback and the equivalence oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

HH = 8          # half-plane rows per obstacle slot (compile_scenario pad)
PPAD = 128      # primitive lanes in the kernel output
F_BLK = 8       # frontier rows per grid step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


class PackedCollision(NamedTuple):
    """Trace-time-packed collision geometry for one scenario."""

    ccx: jnp.ndarray        # (PCpad,) packed collision-point x, primitive-major
    ccy: jnp.ndarray        # (PCpad,)
    hpa: jnp.ndarray        # (OHpad, 1) half-plane a-coefficients (sublanes)
    hpb: jnp.ndarray        # (OHpad, 1)
    hpc: jnp.ndarray        # (OHpad, 1)
    valid_col: jnp.ndarray  # (Opad, 1) 1.0 for live obstacle slots
    gp: jnp.ndarray         # (PCpad, PPAD) point->primitive grouping & mask
    n_prims: int


def pack_collision(cc, cc_mask, halfplanes, obstacle_valid) -> PackedCollision:
    """Pack primitive collision points + padded half-planes for the kernel.

    cc: (P, C, 2) per-primitive collision points (padded), cc_mask: (P, C),
    halfplanes: (O, H, 3) in compile_scenario convention, obstacle_valid: (O,).
    """
    P, C, _ = cc.shape
    O, H, _ = halfplanes.shape
    assert H <= HH
    assert P <= PPAD
    dtype = cc.dtype

    PCpad = _round_up(P * C, 128)
    ccx = jnp.zeros((PCpad,), dtype).at[: P * C].set(cc[:, :, 0].reshape(-1))
    ccy = jnp.zeros((PCpad,), dtype).at[: P * C].set(cc[:, :, 1].reshape(-1))

    Opad = _round_up(max(O, 1), 8)
    OHpad = Opad * HH
    # pad extra rows of real obstacles with [0,0,-1] (always satisfied) and
    # whole padded slots with [0,0,+1] (never satisfied) — same convention
    # as worlds/scenario.py, so either padding style is collision-neutral
    hp = jnp.full((Opad, HH, 3), jnp.asarray([0.0, 0.0, 1.0], dtype))
    if H < HH:
        fill = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, -1.0], dtype), (O, HH - H, 3)
        )
        rows = jnp.concatenate([halfplanes.astype(dtype), fill], axis=1)
    else:
        rows = halfplanes.astype(dtype)
    hp = hp.at[:O].set(rows)
    hp = hp.reshape(OHpad, 3)

    valid_col = jnp.zeros((Opad, 1), dtype).at[:O, 0].set(
        obstacle_valid.astype(dtype)
    )

    # static grouping matrix: gp[p*C + c, p] = cc_mask[p, c]
    gp = np.zeros((PCpad, PPAD), np.float32)
    mask_np = np.asarray(cc_mask, bool)
    for p in range(P):
        gp[p * C : (p + 1) * C, p] = mask_np[p].astype(np.float32)

    return PackedCollision(
        ccx=ccx,
        ccy=ccy,
        hpa=hp[:, 0:1],
        hpb=hp[:, 1:2],
        hpc=hp[:, 2:3],
        valid_col=valid_col,
        gp=jnp.asarray(gp, dtype),
        n_prims=P,
    )


def _kernel(wx_ref, wy_ref, hpa_ref, hpb_ref, hpc_ref, valid_ref, gp_ref,
            out_ref):
    OH = hpa_ref.shape[0]
    O = OH // HH
    Fb, PC = wx_ref.shape

    # (OH, 1, 1) x (1, Fb, PC) -> (OH, Fb, PC): whole tensor VMEM-resident
    hpa = hpa_ref[:].reshape(OH, 1, 1)
    hpb = hpb_ref[:].reshape(OH, 1, 1)
    hpc = hpc_ref[:].reshape(OH, 1, 1)
    vals = hpa * wx_ref[:][None] + hpb * wy_ref[:][None] + hpc
    viol = jnp.where(vals > 0.0, 1.0, 0.0)

    # all rows of an obstacle satisfied <=> no violated row in its 8-group
    obs_viol = jnp.max(viol.reshape(O, HH, Fb, PC), axis=1)   # (O, Fb, PC)
    inside = (1.0 - obs_viol) * valid_ref[:].reshape(O, 1, 1)
    pc_any = jnp.max(inside, axis=0)                          # (Fb, PC)

    # group "any point of primitive p" via one small MXU matmul
    counts = jax.lax.dot_general(
        pc_any, gp_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                          # (Fb, PPAD)
    out_ref[:] = counts


def frontier_collision(
    ep,                       # (F, 3) frontier poses
    packed: PackedCollision,
    interpret: bool = False,
):
    """(F, P) bool: candidate (frontier f, primitive p) hits any obstacle."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = ep.shape[0]
    PCpad = packed.ccx.shape[0]
    OHpad = packed.hpa.shape[0]
    Opad = packed.valid_col.shape[0]
    dtype = ep.dtype
    assert F % F_BLK == 0, f"frontier {F} must be a multiple of {F_BLK}"

    # world-frame collision points (XLA: tiny, fused into the scan body)
    c, s = jnp.cos(ep[:, 2]), jnp.sin(ep[:, 2])
    wx = ep[:, 0:1] + c[:, None] * packed.ccx[None, :] - s[:, None] * packed.ccy[None, :]
    wy = ep[:, 1:2] + s[:, None] * packed.ccx[None, :] + c[:, None] * packed.ccy[None, :]

    def blk(shape):
        return pl.BlockSpec(
            shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
        )

    counts = pl.pallas_call(
        _kernel,
        grid=(F // F_BLK,),
        in_specs=[
            pl.BlockSpec((F_BLK, PCpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((F_BLK, PCpad), lambda i: (i, 0), memory_space=pltpu.VMEM),
            blk((OHpad, 1)),
            blk((OHpad, 1)),
            blk((OHpad, 1)),
            blk((Opad, 1)),
            blk((PCpad, PPAD)),
        ],
        out_specs=pl.BlockSpec(
            (F_BLK, PPAD), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((F, PPAD), jnp.float32),
        interpret=interpret,
    )(
        wx.astype(jnp.float32), wy.astype(jnp.float32),
        packed.hpa.astype(jnp.float32), packed.hpb.astype(jnp.float32),
        packed.hpc.astype(jnp.float32), packed.valid_col.astype(jnp.float32),
        packed.gp.astype(jnp.float32),
    )
    del dtype
    return counts[:, : packed.n_prims] > 0.5
