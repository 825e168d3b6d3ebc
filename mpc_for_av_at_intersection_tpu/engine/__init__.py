from .closed_loop import (
    EngineConfig,
    EngineState,
    Telemetry,
    WorldArrays,
    engine_tick,
    init_engine_state,
    make_world,
    run_episode,
    run_episode_live,
)
from .fleet import engine_tick_fleet, run_fleet_episodes
from .multi_ego import (
    MultiEgoState,
    MultiEgoWorld,
    init_multi_ego_state,
    make_multi_ego_world,
    multi_ego_tick,
    run_multi_ego_episode,
)

__all__ = [
    "MultiEgoState",
    "MultiEgoWorld",
    "init_multi_ego_state",
    "make_multi_ego_world",
    "multi_ego_tick",
    "run_multi_ego_episode",
    "EngineConfig",
    "EngineState",
    "Telemetry",
    "WorldArrays",
    "engine_tick",
    "init_engine_state",
    "make_world",
    "run_episode",
    "run_episode_live",
]
