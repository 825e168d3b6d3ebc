from .primitives import PrimitiveTable, primitive_table, PRIMITIVE_SPECS
from .astar import AStar
from .search import SearchWeights, MotionPrimitiveSearch

__all__ = [
    "PrimitiveTable",
    "primitive_table",
    "PRIMITIVE_SPECS",
    "AStar",
    "SearchWeights",
    "MotionPrimitiveSearch",
]
