"""Frame-windowed conflict detection + reference-trajectory cutoff.

Masked, fixed-shape twin of reference ``main/lib/collision_avoidance.py``:

1. every obstacle prediction is time-shifted by every offset in
   [-frame_window, +frame_window] (robustness to timing misalignment);
2. ego and obstacle collision-circle centers are compared frame-aligned
   (ego frame k vs shifted obstacle frame k) over
   n_iter = max(len(ego), len(pred)) frames, trajectories padded by
   repeating their last pose (phantom tail frames DO count, as in the
   reference's `_pad_trajectory`, :18-29);
3. the FIRST hit in (frame, ego-circle, obstacle, shift, obstacle-circle)
   lexicographic order picks the colliding obstacle-circle position —
   replicating the row ordering produced by `_combine_rowwise_repeat`
   (:10-15) + `np.argmax` (:81);
4. that position is re-localized on the detailed path by scanning circle
   trajectories circle-major and taking argmax % path_len (:92-98).

Instead of returning a truncated array (dynamic shape), the cutoff helper
returns an index; the engine masks the course length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CollisionScan(NamedTuple):
    found: jnp.ndarray       # () bool
    xy: jnp.ndarray          # (2,) collision point on the detailed path
    frame_idx: jnp.ndarray   # () int32 index into the detailed path


def _circle_points(poses, circle_centers):
    """poses (..., 3) x (n_c, 2) offsets -> (..., n_c, 2) world points."""
    th = poses[..., 2]
    c, s = jnp.cos(th), jnp.sin(th)
    ox, oy = circle_centers[:, 0], circle_centers[:, 1]
    px = poses[..., 0:1] + c[..., None] * ox - s[..., None] * oy
    py = poses[..., 1:2] + s[..., None] * ox + c[..., None] * oy
    return jnp.stack([px, py], axis=-1)


def check_collision_moving_cars(
    ego_traj,          # (N_F, 3) padded resampled ego future trajectory
    n_ego,             # () int32
    detail_traj,       # (N_T, 3) padded detailed path
    n_detail,          # () int32
    obs_trajs,         # (n_obs, n_pred, 3) predicted obstacle trajectories
    obs_active,        # (n_obs,) bool
    circle_centers,    # (n_c, 2)
    radius: float,
    frame_window: int,
    n_frames: int,     # static frame buffer (>= any max(n_ego, n_pred))
) -> CollisionScan:
    n_obs, n_pred, _ = obs_trajs.shape
    dtype = ego_traj.dtype
    min_d2 = (2.0 * radius) ** 2

    frames = jnp.arange(n_frames)
    n_iter = jnp.maximum(n_ego, n_pred)
    frame_valid = frames < n_iter

    # ego circle points per frame (padded by repeating the last valid pose)
    ego_idx = jnp.minimum(frames, jnp.maximum(n_ego - 1, 0))
    ego_cc = _circle_points(ego_traj[ego_idx], circle_centers)   # (N_F, n_c, 2)

    # shifted obstacle poses: shift s delays by s frames (s<0 advances)
    shifts = jnp.arange(-frame_window, frame_window + 1)          # (S,)
    src = jnp.clip(frames[None, :] - shifts[:, None], 0, n_pred - 1)  # (S, N_F)
    shifted = obs_trajs[:, src]                                    # (n_obs, S, N_F, 3)
    obs_cc = _circle_points(shifted, circle_centers)               # (n_obs, S, N_F, n_c, 2)

    # frame-aligned pairwise distances: (N_F, n_c_ego, n_obs, S, n_c_obs)
    d = ego_cc[:, :, None, None, None, :] - jnp.moveaxis(obs_cc, 2, 0)[:, None]
    hit = jnp.sum(d * d, axis=-1) <= min_d2
    hit = hit & frame_valid[:, None, None, None, None]
    hit = hit & obs_active[None, None, :, None, None]

    flat = hit.reshape(-1)
    first = jnp.argmax(flat)
    found = flat[first]

    # unravel to recover the colliding obstacle-circle position
    n_c = circle_centers.shape[0]
    S = shifts.shape[0]
    sizes = (n_frames, n_c, n_obs, S, n_c)
    idxs = []
    rem = first
    for sz in sizes[::-1]:
        idxs.append(rem % sz)
        rem = rem // sz
    co, s_i, o_i, _, f_i = idxs  # reversed order
    obs_pos = obs_cc[o_i, s_i, f_i, co]                            # (2,)

    # re-localize on the detailed path: circle-major scan, argmax % N_T
    N_T = detail_traj.shape[0]
    det_cc = _circle_points(detail_traj, circle_centers)           # (N_T, n_c, 2)
    det_cc = jnp.moveaxis(det_cc, 1, 0)                            # (n_c, N_T, 2)
    dd = det_cc - obs_pos
    hit2 = jnp.sum(dd * dd, axis=-1) <= min_d2
    hit2 = hit2 & (jnp.arange(N_T) < n_detail)[None, :]
    first2 = jnp.argmax(hit2.reshape(-1))
    frame_idx = (first2 % N_T).astype(jnp.int32)

    xy = detail_traj[frame_idx, :2]
    return CollisionScan(found=found, xy=xy, frame_idx=frame_idx)


def cutoff_index_by_position(points, n_valid, xy, radius: float = 0.001):
    """First index of `points` within `radius` of `xy`
    (reference ``collision_avoidance.py:107-119``). Returns (found, idx)."""
    N = points.shape[0]
    d = jnp.linalg.norm(points[:, :2] - xy, axis=-1)
    near = (d <= radius) & (jnp.arange(N) < n_valid)
    idx = jnp.argmax(near)
    return near[idx], idx.astype(jnp.int32)
