from .mesh import batch_mesh, run_batch_episodes, stack_worlds, stack_states

__all__ = ["batch_mesh", "run_batch_episodes", "stack_worlds", "stack_states"]
