"""SE(2) transforms, batched and fusion-friendly.

Capability parity with reference ``main/lib/linalg.py`` (homogeneous-matrix
transforms) — but implemented as direct rotate+translate arithmetic so XLA
fuses it into surrounding elementwise work instead of emitting tiny matmuls.
"""

from __future__ import annotations

import jax.numpy as jnp


def transform_points_xy(pose, points_xy):
    """Rigidly transform 2-D points into the frame given by ``pose``.

    pose: (..., 3) = (x, y, theta)  — frame origin/orientation in world space
    points_xy: (..., N, 2)          — points in the local frame
    returns (..., N, 2) world-space points.

    Broadcasting: pose leading dims broadcast against points' leading dims.
    """
    x, y, th = pose[..., 0], pose[..., 1], pose[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    px, py = points_xy[..., 0], points_xy[..., 1]
    wx = c[..., None] * px - s[..., None] * py + x[..., None]
    wy = s[..., None] * px + c[..., None] * py + y[..., None]
    return jnp.stack([wx, wy], axis=-1)


def transform_poses(pose, local_poses):
    """Transform (x, y, theta) triplets: rotate+translate xy, add theta.

    The theta column is handled additively, matching reference
    ``linalg.py:47-49``.

    pose: (..., 3); local_poses: (..., N, 3) -> (..., N, 3)
    """
    xy = transform_points_xy(pose, local_poses[..., :2])
    th = local_poses[..., 2] + pose[..., 2][..., None]
    return jnp.concatenate([xy, th[..., None]], axis=-1)
