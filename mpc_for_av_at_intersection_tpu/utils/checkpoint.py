"""Checkpoint / resume for long-running fleet simulations.

The reference has no runtime persistence (SURVEY section 5.4); this adds
it as first-class: any engine-state pytree (single-, multi-ego, or batched)
round-trips through a flat ``.npz`` snapshot, and ``run_chunked`` executes
an episode in chunks with a checkpoint after each chunk so a preempted
sweep resumes where it stopped.
"""

from __future__ import annotations

import os
import pathlib
from typing import Optional, Tuple

import jax
import numpy as np


def save_state(path, state) -> None:
    """Snapshot a pytree of arrays to ``path`` (atomic rename)."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    path = pathlib.Path(path)
    tmp = path.with_suffix(".tmp.npz")
    np.savez(
        tmp,
        __treedef__=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    os.replace(tmp, path)


def load_state(path, like):
    """Restore a pytree snapshot; ``like`` provides the tree structure."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = len(leaves)
    restored = [data[f"leaf_{i}"] for i in range(n)]
    return jax.tree_util.tree_unflatten(
        treedef,
        [np.asarray(r).astype(np.asarray(l).dtype) for r, l in zip(restored, leaves)],
    )


def run_chunked(
    step_many,          # (state, n_steps) -> (state, telemetry)
    state0,
    n_steps: int,
    chunk: int,
    ckpt_path: Optional[str] = None,
) -> Tuple[object, list]:
    """Run ``n_steps`` in chunks, checkpointing after each chunk.

    If ``ckpt_path`` exists, resumes from it (the saved state carries its
    own tick counter). Returns (final_state, list of per-chunk telemetry).
    """
    state = state0
    done_steps = 0
    if ckpt_path and pathlib.Path(ckpt_path).exists():
        state = load_state(ckpt_path, state0)
        tick = getattr(state, "tick", None)
        done_steps = int(np.max(np.asarray(tick))) if tick is not None else 0

    tels = []
    while done_steps < n_steps:
        this = min(chunk, n_steps - done_steps)
        state, tel = step_many(state, this)
        tels.append(jax.tree.map(np.asarray, tel))
        done_steps += this
        if ckpt_path:
            save_state(ckpt_path, jax.tree.map(np.asarray, state))
    return state, tels
