"""Pallas TPU kernel: serial A* lattice search with VMEM-resident grid state.

Motivation (measured, round 3): this environment's TPU sustains only
~1 GB/s of HBM streaming while the MXU delivers ~1.6 TFLOP/s, so the XLA
wavefront search (lattice/wavefront.py) — which touches several full-grid
arrays per iteration — is HBM-bound at ~8 ms per scenario-iteration, and
XLA gather/scatter serializes at ~0.4 us per element. The fix is
architectural: run the WHOLE search inside one Pallas program per scenario
with every grid array resident in VMEM scratch (~8 MB for the flagship
grid), so the per-expansion cost is a handful of VPU reduces and (1, 128)
row read-modify-writes — zero HBM traffic until the final result dump.

Algorithm: textbook serial A* over the quantized (x, y, theta) grid — the
same node model as ``wavefront_search`` (exact continuous poses stored per
cell, cells re-openable when a cheaper path appears), but expanding ONE
best cell per step like the host search (``lattice/search.py``, reference
``main/lib/a_star.py:31-78``) instead of a top-F beam, which removes the
beam's recall slack; termination is the host's goal-pop test. The
heuristic/edge-cost family is the full ``SearchWeights`` set, baked in as
compile-time constants.

Collision checking reuses the packed layout of ``ops/collision_pallas.py``
(half-plane rows in sublanes, primitive points in lanes, grouping matmul
on the MXU), inlined so the whole expansion stays in one kernel.

Outputs per scenario: the packed parent/prim grid (one HBM write at the
end) + a small result row; backtracking and exact trajectory replay stay
in XLA (``lattice/wavefront.py``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .collision_pallas import HH

INF = np.float32(np.inf)
PPAD = 128          # primitive lanes (P <= 128)
PP_SHIFT = 16       # parent/prim packing: pp = parent_cell * 16 + prim

# state row lanes
_DONE, _FOUND, _COST, _GCELL, _NEXP, _OOB = 0, 1, 2, 3, 4, 5


class AStarKernelResult(NamedTuple):
    found: jnp.ndarray       # (B,) bool
    cost: jnp.ndarray        # (B,)
    goal_cell: jnp.ndarray   # (B,) int32 — popped goal cell (backtrack entry)
    n_expansions: jnp.ndarray  # (B,) int32
    oob: jnp.ndarray         # (B,) int32 collision-free candidates off-grid
    parent: jnp.ndarray      # (B, N) int32 parent cell per cell (-1 none)
    prim: jnp.ndarray        # (B, N) int32 primitive id per cell (-1 none)


def _kernel(
    # static
    R, nx, ny, ntheta, cell_m, x0, y0, P, max_exp, w, theta_mode_area,
    # refs: inputs
    hpa, hpb, hpc, hpn, valid_col, ccx, ccy, gp,
    ends_x, ends_y, ends_t, lengths, params,
    # refs: outputs
    pp_out, res_out,
    # refs: scratch
    g_ref, f_ref, px_ref, py_ref, pth_ref, st_ref,
):
    import jax.experimental.pallas as pl

    f32 = jnp.float32
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(i32, (1, 128), 1)
    rows_iota = jax.lax.broadcasted_iota(i32, (R, 1), 0)
    two_pi = f32(2.0 * np.pi)

    def ext(row, l):
        """Extract lane l of a (1, 128) row as a scalar (lane reduce)."""
        return jnp.sum(jnp.where(lane == l, row, row.dtype.type(0)))

    def put(ref, r, l, val):
        """Row read-modify-write: ref[r, l] = val."""
        row = ref[pl.ds(r, 1), :]
        ref[pl.ds(r, 1), :] = jnp.where(lane == l, val, row)

    def st_get(l):
        return ext(st_ref[:], l)

    def st_set(l, val):
        st_ref[:] = jnp.where(lane == l, f32(val) if isinstance(val, float)
                              else val.astype(f32), st_ref[:])

    # --- materialize per-scenario blocks (leading block dim dropped) ---
    hpa_ = hpa[0]          # (OHpad, 1)
    hpb_ = hpb[0]
    hpc_ = hpc[0]
    hpn_ = hpn[0]
    vcol = valid_col[0]    # (Opad, 1)
    ccx_ = ccx[:]          # (1, PCpad) shared
    ccy_ = ccy[:]
    gp_ = gp[:]            # (PCpad, PPAD) shared

    # --- scalar params ---
    pr = params[0]         # (1, 128)
    sx, sy, sth = pr[0, 0], pr[0, 1], pr[0, 2]
    gx, gy, gth = pr[0, 3], pr[0, 4], pr[0, 5]
    bx1, by1, bx2, by2 = pr[0, 6], pr[0, 7], pr[0, 8], pr[0, 9]
    ttol = pr[0, 10]

    def cell_of(x, y, th):
        ix = jnp.clip(jnp.floor((x - x0) / cell_m), 0, nx - 1).astype(i32)
        iy = jnp.clip(jnp.floor((y - y0) / cell_m), 0, ny - 1).astype(i32)
        tw = jnp.mod(th + f32(np.pi), two_pi)
        it = jnp.clip(jnp.floor(tw / (two_pi / ntheta)), 0, ntheta - 1
                      ).astype(i32)
        return ix * (ny * ntheta) + iy * ntheta + it

    def wrap_pi(a):
        return jnp.mod(a + f32(np.pi), two_pi) - f32(np.pi)

    def goal_box_dist(x, y):
        dx = jnp.maximum(jnp.maximum(bx1 - x, f32(0.0)), x - bx2)
        dy = jnp.maximum(jnp.maximum(by1 - y, f32(0.0)), y - by2)
        return jnp.sqrt(dx * dx + dy * dy)

    def obstacle_prox(x, y):
        # 1 / min distance to any half-plane boundary (multi_lane.py:78-108);
        # hpn==0 rows are padding. Works for scalar or (1, L) lane vectors.
        d = jnp.abs(hpa_ * x + hpb_ * y + hpc_)
        live = hpn_ > f32(1e-9)
        dmin = jnp.min(
            jnp.where(live, d / jnp.where(live, hpn_, f32(1.0)), INF),
            axis=0, keepdims=True,
        )
        return f32(1.0) / jnp.maximum(dmin, f32(1e-9))

    def heuristic(x, y, th):
        adth = jnp.abs(th - gth)
        if theta_mode_area:
            h = (goal_box_dist(x, y)
                 + f32(2.7) * jnp.maximum(adth - ttol, f32(0.0)))
        else:
            d = jnp.sqrt((x - gx) ** 2 + (y - gy) ** 2)
            dth = jnp.minimum(adth, adth - ttol / f32(2.0))
            h = f32(w.h_dist) * d + f32(w.h_theta) * dth
        if w.h_steering:
            h = h + f32(w.h_steering) * jnp.abs(wrap_pi(gth - th))
        if w.h_obstacle:
            h = h + f32(w.h_obstacle) * obstacle_prox(x, y)
        if w.h_center:
            h = h + f32(w.h_center) * jnp.sqrt(x * x + y * y)
        return h

    def in_goal(x, y, th):
        near = goal_box_dist(x, y) <= f32(1e-5)
        return near & (jnp.abs(th - gth) <= ttol)

    # --- init grid scratch ---
    g_ref[:] = jnp.full((R, 128), INF, f32)
    f_ref[:] = jnp.full((R, 128), INF, f32)
    px_ref[:] = jnp.zeros((R, 128), f32)
    py_ref[:] = jnp.zeros((R, 128), f32)
    pth_ref[:] = jnp.zeros((R, 128), f32)
    # parent/prim lives directly in the output block (saves 1/6 of the
    # VMEM grid budget vs a separate scratch + end-of-kernel copy)
    pp_out[0] = jnp.full((R, 128), -1, i32)
    st_ref[:] = jnp.zeros((1, 128), f32)
    st_ref[:] = jnp.where(lane == _COST, INF, st_ref[:])
    st_ref[:] = jnp.where(lane == _GCELL, f32(-1.0), st_ref[:])

    sc = cell_of(sx, sy, sth)
    r0 = sc // 128
    l0 = sc % 128
    h0 = heuristic(sx, sy, sth)
    # h0 may be (1, 1) when the obstacle term is on — collapse to scalar
    h0 = jnp.sum(h0)
    put(g_ref, r0, l0, f32(0.0))
    put(f_ref, r0, l0, h0)
    put(px_ref, r0, l0, sx)
    put(py_ref, r0, l0, sy)
    put(pth_ref, r0, l0, sth)

    OHp = hpa_.shape[0]
    Op = OHp // HH
    PC = ccx_.shape[1]

    # edge-cost constants per primitive (lane vectors)
    edge = f32(w.c_dist) * lengths[:]
    if w.c_steering:
        edge = edge + f32(w.c_steering) * jnp.abs(wrap_pi(ends_t[:]))

    def body(carry):
        k, _ = carry
        fmat = f_ref[:]
        m = jnp.min(fmat)
        live = m < INF

        @pl.when(live)
        def _():
            # --- pop argmin-f cell ---
            rowmin = jnp.min(fmat, axis=1, keepdims=True)        # (R, 1)
            r = jnp.min(jnp.where(rowmin <= m, rows_iota, R)).astype(i32)
            frow = f_ref[pl.ds(r, 1), :]
            l = jnp.min(jnp.where(frow <= m, lane, 128)).astype(i32)
            cellc = r * 128 + l
            gc = ext(g_ref[pl.ds(r, 1), :], l)
            cx = ext(px_ref[pl.ds(r, 1), :], l)
            cy = ext(py_ref[pl.ds(r, 1), :], l)
            cth = ext(pth_ref[pl.ds(r, 1), :], l)
            f_ref[pl.ds(r, 1), :] = jnp.where(lane == l, INF, frow)  # close

            st_set(_NEXP, st_get(_NEXP) + f32(1.0))

            # --- goal test on pop (host A* semantics) ---
            hit = in_goal(cx, cy, cth)

            @pl.when(hit)
            def _():
                st_set(_DONE, 1.0)
                st_set(_FOUND, 1.0)
                st_set(_COST, gc)
                st_set(_GCELL, cellc.astype(f32))

            @pl.when(jnp.logical_not(hit))
            def _():
                cs = jnp.cos(cth)
                sn = jnp.sin(cth)

                # --- candidate endpoints, all P primitives in lanes ---
                cand_x = cx + cs * ends_x[:] - sn * ends_y[:]    # (1, 128)
                cand_y = cy + sn * ends_x[:] + cs * ends_y[:]
                cand_t = wrap_pi(ends_t[:] + cth)
                cand_g = gc + edge
                if w.c_obstacle and ((not w.gate_edge_obstacle_on_h)
                                     or w.h_obstacle):
                    cand_g = cand_g + f32(w.c_obstacle) * obstacle_prox(
                        cand_x, cand_y)
                if w.c_center:
                    cand_g = cand_g + f32(w.c_center) * jnp.sqrt(
                        cand_x * cand_x + cand_y * cand_y)

                # --- collision (collision_pallas layout, one frontier row) ---
                wx = cx + cs * ccx_ - sn * ccy_                  # (1, PC)
                wy = cy + sn * ccx_ + cs * ccy_
                vals = hpa_ * wx + hpb_ * wy + hpc_              # (OHp, PC)
                viol = jnp.where(vals > f32(0.0), f32(1.0), f32(0.0))
                obs_viol = jnp.max(viol.reshape(Op, HH, PC), axis=1)
                inside = (f32(1.0) - obs_viol) * vcol
                pc_any = jnp.max(inside, axis=0, keepdims=True)  # (1, PC)
                counts = jax.lax.dot_general(
                    pc_any, gp_,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )                                                # (1, PPAD)
                collide = counts > f32(0.5)

                inb = ((cand_x >= f32(x0))
                       & (cand_x < f32(x0 + nx * cell_m))
                       & (cand_y >= f32(y0))
                       & (cand_y < f32(y0 + ny * cell_m)))
                is_prim = lane < P
                free = is_prim & jnp.logical_not(collide)
                valid = free & inb
                oob_n = jnp.sum(
                    jnp.where(free & jnp.logical_not(inb), f32(1.0),
                              f32(0.0)))
                st_set(_OOB, st_get(_OOB) + oob_n)

                cand_f = cand_g + heuristic(cand_x, cand_y, cand_t)
                cand_cell = cell_of(cand_x, cand_y, cand_t)

                # --- commit winners: serial over P primitives ---
                def commit(p, dummy2):
                    lp = lane == p
                    ok = jnp.sum(jnp.where(lp & valid, f32(1.0),
                                           f32(0.0))) > f32(0.5)

                    @pl.when(ok)
                    def _():
                        k = jnp.sum(jnp.where(lp, cand_cell, i32(0)))
                        vg = ext(cand_g, p)
                        vf = ext(cand_f, p)
                        vx = ext(cand_x, p)
                        vy = ext(cand_y, p)
                        vt = ext(cand_t, p)
                        r2 = k // 128
                        l2 = k % 128
                        oldg = ext(g_ref[pl.ds(r2, 1), :], l2)

                        @pl.when(vg < oldg - f32(1e-6))
                        def _():
                            put(g_ref, r2, l2, vg)
                            put(f_ref, r2, l2, vf)
                            put(px_ref, r2, l2, vx)
                            put(py_ref, r2, l2, vy)
                            put(pth_ref, r2, l2, vt)
                            row = pp_out[0, pl.ds(r2, 1), :]
                            pp_out[0, pl.ds(r2, 1), :] = jnp.where(
                                lane == l2, cellc * PP_SHIFT + p, row)
                    return dummy2

                jax.lax.fori_loop(0, P, commit, 0)

        stop = (st_get(_DONE) > f32(0.5)) | jnp.logical_not(live)
        return k + 1, stop

    # while-loop with goal-pop / open-set-exhausted exit (stop flag carried,
    # so the cond is scalar-only): each program is fully serial, so dead
    # iterations after the goal pops would still pay a full (R, 128)
    # min-reduction each — on easy scenarios that wasted most of max_exp
    # iterations (ADVICE r3 #4)
    def loop_cond(carry):
        k, stop = carry
        return (k < max_exp) & jnp.logical_not(stop)

    jax.lax.while_loop(
        loop_cond, body, (jnp.asarray(0, i32), jnp.asarray(False))
    )

    res_out[0] = st_ref[:]


@functools.lru_cache(maxsize=32)
def _astar_call(R, nx, ny, ntheta, cell_m, x0, y0, P, max_exp, weights,
                B, OHpad, Opad, PCpad, interpret):
    """Memoized jitted pallas launcher — repeated searches with the same
    grid/weights/shapes hit one compiled executable."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kern = functools.partial(
        _kernel, R, nx, ny, ntheta, np.float32(cell_m), np.float32(x0),
        np.float32(y0), P, max_exp, weights,
        weights.heuristic_mode == "area",
    )

    def per_b(shape):
        return pl.BlockSpec((1,) + shape, lambda b: (b,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def shared(shape):
        return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(hpa, hpb, hpc, hpn, valid_col, ccx, ccy, gp,
            ends_x, ends_y, ends_t, lengths, params):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[
                per_b((OHpad, 1)), per_b((OHpad, 1)), per_b((OHpad, 1)),
                per_b((OHpad, 1)), per_b((Opad, 1)),
                shared((1, PCpad)), shared((1, PCpad)),
                shared((PCpad, PPAD)),
                shared((1, 128)), shared((1, 128)), shared((1, 128)),
                shared((1, 128)),
                per_b((1, 128)),
            ],
            out_specs=(
                pl.BlockSpec((1, R, 128), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM),
                per_b((1, 128)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((B, R, 128), jnp.int32),
                jax.ShapeDtypeStruct((B, 1, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, 128), jnp.float32),   # g
                pltpu.VMEM((R, 128), jnp.float32),   # f
                pltpu.VMEM((R, 128), jnp.float32),   # px
                pltpu.VMEM((R, 128), jnp.float32),   # py
                pltpu.VMEM((R, 128), jnp.float32),   # pth
                pltpu.VMEM((1, 128), jnp.float32),   # state row
            ],
            # grids past ~theta=40 exceeded the 16 MB default scoped-VMEM
            # budget; v5e has 128 MB physical VMEM — raise the compiler cap
            # so denser theta grids stay available
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(hpa, hpb, hpc, hpn, valid_col, ccx, ccy, gp,
          ends_x, ends_y, ends_t, lengths, params)

    return run


def astar_search_batch(
    halfplanes,       # (B, O, H, 3)
    obstacle_valid,   # (B, O)
    start,            # (B, 3)
    goal,             # (B, 3)
    goal_box,         # (B, 4)
    theta_tol,        # (B,)
    prims,            # PrimitiveDeviceData (numpy, compile-time constant)
    cfg,              # WavefrontConfig (grid geometry)
    weights,          # SearchWeights
    max_expansions: int = 6144,
    interpret: bool = False,
) -> AStarKernelResult:
    """Run B independent serial-A* searches, one Pallas program each."""
    from .collision_pallas import _round_up

    B = start.shape[0]
    O, H, _ = np.shape(halfplanes)[1:]
    P, C, _ = prims.cc.shape
    # parent/prim packing pp = parent_cell * PP_SHIFT + prim silently
    # corrupts backtracking if the primitive family ever grows past the
    # shift base (ADVICE r3 #2)
    assert P < PP_SHIFT, (
        f"primitive count {P} >= PP_SHIFT={PP_SHIFT}: widen PP_SHIFT "
        "(next power of two >= P) before using this kernel"
    )
    N = cfg.n_cells
    R = _round_up(N, 128) // 128
    f32 = jnp.float32

    # ---- pack collision geometry ----
    PCpad = _round_up(P * C, 128)
    ccx = np.zeros((1, PCpad), np.float32)
    ccy = np.zeros((1, PCpad), np.float32)
    ccx[0, : P * C] = np.asarray(prims.cc[:, :, 0].reshape(-1))
    ccy[0, : P * C] = np.asarray(prims.cc[:, :, 1].reshape(-1))

    Opad = _round_up(max(O, 1), 8)
    OHpad = Opad * HH
    hp_src = np.asarray(halfplanes, np.float32)
    hp = np.broadcast_to(
        np.asarray([0.0, 0.0, 1.0], np.float32), (B, Opad, HH, 3)
    ).copy()
    if H < HH:
        fill = np.broadcast_to(
            np.asarray([0.0, 0.0, -1.0], np.float32), (B, O, HH - H, 3))
        rows = np.concatenate([hp_src, fill], axis=2)
    else:
        rows = hp_src
    hp[:, :O] = rows
    hp = hp.reshape(B, OHpad, 3)

    # norms only for REAL rows of live obstacles (obstacle-proximity terms)
    ov = np.asarray(obstacle_valid, bool)
    real_rows = np.hypot(hp_src[..., 0], hp_src[..., 1]) > 1e-9
    real_rows = real_rows & ov[:, :, None]                     # (B, O, H)
    if H < HH:
        real_rows = np.concatenate(
            [real_rows, np.zeros((B, O, HH - H), bool)], axis=2)
    real = np.zeros((B, OHpad), bool)
    real[:, : O * HH] = real_rows.reshape(B, O * HH)
    nrm = np.hypot(hp[..., 0], hp[..., 1])
    hpn = np.where(real, nrm, 0.0).astype(np.float32)[..., None]

    valid_col = np.zeros((B, Opad, 1), np.float32)
    valid_col[:, :O, 0] = ov.astype(np.float32)

    gp = np.zeros((PCpad, PPAD), np.float32)
    mask_np = np.asarray(prims.cc_mask, bool)
    for p in range(P):
        gp[p * C: (p + 1) * C, p] = mask_np[p].astype(np.float32)

    ends = np.asarray(prims.ends, np.float32)
    ends_x = np.zeros((1, 128), np.float32)
    ends_y = np.zeros((1, 128), np.float32)
    ends_t = np.zeros((1, 128), np.float32)
    lengths = np.zeros((1, 128), np.float32)
    ends_x[0, :P] = ends[:, 0]
    ends_y[0, :P] = ends[:, 1]
    ends_t[0, :P] = ends[:, 2]
    lengths[0, :P] = np.asarray(prims.lengths, np.float32)

    params = jnp.concatenate(
        [jnp.asarray(start, f32), jnp.asarray(goal, f32),
         jnp.asarray(goal_box, f32),
         jnp.asarray(theta_tol, f32)[:, None],
         jnp.zeros((B, 128 - 11), f32)], axis=1
    ).reshape(B, 1, 128)

    run = _astar_call(
        R, cfg.nx, cfg.ny, cfg.ntheta, float(cfg.cell), float(cfg.x0),
        float(cfg.y0), P, max_expansions, weights,
        B, OHpad, Opad, PCpad, interpret,
    )
    pp_grid, res = run(
        jnp.asarray(hp[..., 0:1]), jnp.asarray(hp[..., 1:2]),
        jnp.asarray(hp[..., 2:3]), jnp.asarray(hpn),
        jnp.asarray(valid_col),
        jnp.asarray(ccx), jnp.asarray(ccy), jnp.asarray(gp),
        jnp.asarray(ends_x), jnp.asarray(ends_y), jnp.asarray(ends_t),
        jnp.asarray(lengths),
        params,
    )

    res = res.reshape(B, 128)
    ppf = pp_grid.reshape(B, R * 128)[:, :N]
    parent = jnp.where(ppf >= 0, ppf // PP_SHIFT, -1).astype(jnp.int32)
    prim = jnp.where(ppf >= 0, ppf % PP_SHIFT, -1).astype(jnp.int32)
    found = res[:, _FOUND] > 0.5
    return AStarKernelResult(
        found=found,
        cost=jnp.where(found, res[:, _COST], jnp.inf),
        goal_cell=res[:, _GCELL].astype(jnp.int32),
        n_expansions=res[:, _NEXP].astype(jnp.int32),
        oob=res[:, _OOB].astype(jnp.int32),
        parent=parent,
        prim=prim,
    )
