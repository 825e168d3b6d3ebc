from .build import load_native, native_available
from .search import NativeMotionPrimitiveSearch

__all__ = ["load_native", "native_available", "NativeMotionPrimitiveSearch"]
