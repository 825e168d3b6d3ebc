from .angles import normalize_angle, smooth_yaw
from .dynamics import (
    SimLimits,
    bicycle_step,
    bicycle_rollout,
    plant_step,
    plant_rollout,
)
from .transforms import transform_poses, transform_points_xy
from .curves import (
    arc_positions,
    resample_mask,
    compact_by_mask,
    nearest_index,
    nearest_index_in_direction,
)

__all__ = [
    "normalize_angle",
    "smooth_yaw",
    "SimLimits",
    "bicycle_step",
    "bicycle_rollout",
    "plant_step",
    "plant_rollout",
    "transform_poses",
    "transform_points_xy",
    "arc_positions",
    "resample_mask",
    "compact_by_mask",
    "nearest_index",
    "nearest_index_in_direction",
]
