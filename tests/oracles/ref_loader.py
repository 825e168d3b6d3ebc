"""Import helpers for using the (read-only) reference repo as a test oracle.

The reference env modules are pure NumPy/matplotlib geometry generators; we
import them directly to generate golden scenario data — no reference code is
copied into this repo. Reference modules use both `lib.*` and `main.lib.*`
import styles and matplotlib at import time, handled here.
"""

from __future__ import annotations

import sys

import matplotlib

matplotlib.use("Agg")

_REF = "/root/reference"
_REF_MAIN = "/root/reference/main"


def add_reference_paths():
    for p in (_REF, _REF_MAIN):
        if p not in sys.path:
            sys.path.insert(0, p)


def stub_motion_primitive_module():
    """Pre-register stub `lib.motion_primitive` / `main.lib.motion_primitive`
    modules: the reference's MotionPrimitive dataclass has a mutable ndarray
    default, which raises at class-definition time under Python 3.12, taking
    down any module that imports it. The reference search code only reads
    .points / .total_length off primitive objects."""
    import types

    class MotionPrimitive:
        def __init__(self, name="", forward_speed=0.0, steering_angle=0.0,
                     n_seconds=0.0, total_length=0.0, points=None):
            self.name = name
            self.forward_speed = forward_speed
            self.steering_angle = steering_angle
            self.n_seconds = n_seconds
            self.total_length = total_length
            self.points = points

    for modname in ("lib.motion_primitive", "main.lib.motion_primitive"):
        if modname not in sys.modules:
            mod = types.ModuleType(modname)
            mod.MotionPrimitive = MotionPrimitive
            sys.modules[modname] = mod
    return MotionPrimitive


def load_ref_env(name: str):
    """Import a reference env module, e.g. load_ref_env('intersection')."""
    add_reference_paths()
    import importlib

    return importlib.import_module(f"envs.{name}")


def scenario_signature(scenario, margin: float = 0.0):
    """Canonical, order-independent description of a reference or rebuilt
    scenario: (start, goal, goal-area half-planes, sorted obstacle
    half-plane blocks with hidden flags)."""
    import numpy as np

    def hp_of(o):
        if hasattr(o, "to_convex"):
            return np.asarray(o.to_convex(margin=margin), dtype=np.float64)
        return np.asarray(o.halfplanes(margin=margin), dtype=np.float64)

    def hidden_of(o):
        return bool(o.hidden)

    blocks = []
    for o in scenario.obstacles:
        h = hp_of(o)
        blocks.append((hidden_of(o), h.shape[0], np.round(h, 9).tobytes()))
    blocks.sort()
    goal_hp = np.round(hp_of(scenario.goal_area), 9).tobytes()
    return (
        tuple(np.round(np.asarray(scenario.start, dtype=np.float64), 9)),
        tuple(np.round(np.asarray(scenario.goal_point, dtype=np.float64), 9)),
        float(np.round(scenario.allowed_goal_theta_difference, 9)),
        goal_hp,
        tuple(blocks),
    )
