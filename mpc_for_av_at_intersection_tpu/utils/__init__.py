from .plotting import (
    draw_scenario,
    draw_car,
    draw_point_arrow,
    draw_search_points,
    overlay_telemetry,
    plot_telemetry,
    plot_trajectories,
    animate_episode,
)

__all__ = [
    "draw_scenario",
    "draw_car",
    "draw_point_arrow",
    "draw_search_points",
    "overlay_telemetry",
    "plot_telemetry",
    "plot_trajectories",
    "animate_episode",
]
