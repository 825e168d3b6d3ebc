"""Velocity-lookahead reference extraction from a padded course.

Masked twin of reference ``main/lib/mpc.py:86-109`` (`_calc_ref_trajectory`):
advance the course-localization index in the travel direction, then index
the course by predicted travel distance (cumsum of |planned speed| * dt
quantized to the course tick dl, banker's rounding like np.rint), clamped to
the course end; mark horizon slots that hit the end (`reaches_end`) — those
switch the tracking cost to the terminal Qf and damp inputs.

The speed-reference variant additionally returns a velocity row read from a
course speed channel (reference ``mpc_with_speed.py:85-109``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.curves import nearest_index_in_direction


class ReferenceOut(NamedTuple):
    xref: jnp.ndarray        # (4, T+1): x, y, v, yaw rows
    target_idx: jnp.ndarray  # () int32 — updated localization index
    reaches_end: jnp.ndarray  # (T+1,) bool


def compute_reference(
    state4,              # (4,) x, y, v, yaw
    course,              # (N, 3) padded x, y, yaw
    course_speed,        # (N,) speed channel (zeros if unused)
    valid_len,           # () int32
    dl,                  # () course tick
    start_idx,           # () int32
    ov,                  # (T+1,) planned speeds from previous solve
    have_ov,             # () bool — False on the first tick
    T: int,
    dt: float,
    fallback_speed: float = 10.0 / 3.6,
    use_speed_channel: bool = False,
):
    xy = state4[:2]
    start_idx = nearest_index_in_direction(
        xy, course[:, :2], start_idx, valid_len, forward=True
    )

    default_ov = jnp.maximum(state4[2], fallback_speed) * jnp.ones((T + 1,), course.dtype)
    ov_eff = jnp.where(have_ov, ov, default_ov)

    travel = jnp.cumsum(jnp.abs(ov_eff) * dt)
    idx = jnp.rint(travel / dl).astype(jnp.int32)
    idx = jnp.minimum(idx + start_idx, valid_len - 1)

    xref = jnp.stack(
        [
            course[idx, 0],
            course[idx, 1],
            course_speed[idx] if use_speed_channel else jnp.zeros((T + 1,), course.dtype),
            course[idx, 2],
        ]
    )
    reaches_end = idx == (valid_len - 1)
    return ReferenceOut(xref, start_idx, reaches_end)
