from .closed_loop import (
    EngineConfig,
    EngineState,
    Telemetry,
    WorldArrays,
    engine_tick,
    init_engine_state,
    make_world,
    run_episode,
)

__all__ = [
    "EngineConfig",
    "EngineState",
    "Telemetry",
    "WorldArrays",
    "engine_tick",
    "init_engine_state",
    "make_world",
    "run_episode",
]
