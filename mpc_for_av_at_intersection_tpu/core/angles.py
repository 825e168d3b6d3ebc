"""Angle utilities (jit/vmap-safe).

Parity targets: reference ``main/lib/maths.py:4`` (normalize_angle) and
``main/lib/mpc.py:43-55`` (smooth_yaw).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def normalize_angle(theta):
    """Wrap angle(s) to [-pi, pi). Elementwise; any shape."""
    theta = jnp.mod(theta, TWO_PI)
    return jnp.where(theta >= jnp.pi, theta - TWO_PI, theta)


def _smooth_step(prev_adj, raw_next):
    """One step of the sequential yaw unwrap.

    Mirrors the two-phase while-loop semantics of reference mpc.py:43-55:
    first subtract 2*pi until the delta is < pi/2, then add 2*pi until the
    delta is > -pi/2 (the phases do not alternate). Closed form of both
    loop counts.
    """
    d0 = raw_next - prev_adj
    half_pi = jnp.pi / 2.0
    k = jnp.where(d0 >= half_pi, jnp.floor((d0 - half_pi) / TWO_PI) + 1.0, 0.0)
    d1 = d0 - TWO_PI * k
    m = jnp.where(d1 <= -half_pi, jnp.floor((-half_pi - d1) / TWO_PI) + 1.0, 0.0)
    d2 = d1 + TWO_PI * m
    adj = prev_adj + d2
    return adj, adj


def smooth_yaw_numpy(yaw):
    """Host-side (NumPy, float64) twin of ``smooth_yaw`` for scenario setup.

    Replicates a load-bearing reference quirk: ``MPC.__init__`` smooths the
    course yaw *in place through a NumPy view of the full trajectory array*
    (mpc.py:257 mutates ``trajectory_full[:, 2]``), so even though
    ``set_trajectory_fromarray`` later re-reads the "raw" trajectory every
    tick, the yaw it reads has already been permanently unwrapped. Engine
    setup therefore smooths the course yaw exactly once, here.
    """
    import numpy as np

    yaw = np.asarray(yaw, dtype=np.float64).copy()
    half_pi = np.pi / 2.0
    two_pi = 2.0 * np.pi
    for i in range(len(yaw) - 1):
        d = yaw[i + 1] - yaw[i]
        if d >= half_pi:
            yaw[i + 1] -= two_pi * (np.floor((d - half_pi) / two_pi) + 1.0)
            d = yaw[i + 1] - yaw[i]
        if d <= -half_pi:
            yaw[i + 1] += two_pi * (np.floor((-half_pi - d) / two_pi) + 1.0)
    return yaw


def smooth_yaw(yaw, valid_mask=None):
    """Sequentially unwrap a course-yaw array so consecutive deltas avoid
    +-pi jumps (behavioral twin of reference ``smooth_yaw``).

    ``yaw``: (N,) array. ``valid_mask``: optional (N,) bool; invalid entries
    are passed through the recursion as copies of the previous adjusted value
    so padding cannot corrupt the unwrap.
    """
    if valid_mask is not None:
        # Substitute padded entries with a value that never triggers a jump:
        # carry forward the raw previous valid value via a pre-pass is not
        # needed; instead mark them and skip their adjustment below.
        pass

    def step(prev_adj, inp):
        raw_next, is_valid = inp
        adj, _ = _smooth_step(prev_adj, raw_next)
        adj = jnp.where(is_valid, adj, prev_adj)
        return adj, adj

    if valid_mask is None:
        valid_mask = jnp.ones(yaw.shape, dtype=bool)
    first = yaw[0]
    _, out = jax.lax.scan(step, first, (yaw[1:], valid_mask[1:]))
    out = jnp.concatenate([yaw[:1], out])
    return jnp.where(valid_mask, out, yaw)
