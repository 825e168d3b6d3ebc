from .mesh import (
    batch_mesh,
    host_chip_mesh,
    run_batch_episodes,
    stack_worlds,
    stack_states,
)

__all__ = [
    "batch_mesh",
    "host_chip_mesh",
    "run_batch_episodes",
    "stack_worlds",
    "stack_states",
]
