from .primitives import PrimitiveTable, primitive_table, PRIMITIVE_SPECS
from .astar import AStar
from .search import SearchWeights, MotionPrimitiveSearch
from .wavefront import (
    WavefrontConfig,
    WavefrontResult,
    plan_courses_device,
    prepare_primitives,
    wavefront_search,
)

__all__ = [
    "PrimitiveTable",
    "primitive_table",
    "PRIMITIVE_SPECS",
    "AStar",
    "SearchWeights",
    "MotionPrimitiveSearch",
    "WavefrontConfig",
    "WavefrontResult",
    "plan_courses_device",
    "prepare_primitives",
    "wavefront_search",
]
