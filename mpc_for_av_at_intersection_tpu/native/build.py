"""Build + load the native planner core (ctypes; no pybind11 available).

The shared object is compiled on first use with g++ -O3 and cached next to
the source; callers fall back to the pure-Python search when no compiler is
present.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading
from typing import Optional

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "lattice_search.cpp"
_SO = _DIR / "_lattice_search.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is not None:
            return _lib
        if _failed:
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _compile():
                _failed = True
                return None
        lib = ctypes.CDLL(str(_SO))
        c_double_p = ctypes.POINTER(ctypes.c_double)
        c_i64_p = ctypes.POINTER(ctypes.c_int64)
        c_i32_p = ctypes.POINTER(ctypes.c_int32)
        lib.lattice_search.restype = ctypes.c_int
        lib.lattice_search.argtypes = [
            ctypes.c_int, c_double_p, c_double_p, c_double_p, c_i64_p,
            c_double_p, c_i64_p, ctypes.c_int,
            c_double_p, c_double_p, c_double_p, ctypes.c_double,
            c_double_p, ctypes.c_int64,
            c_double_p, c_i32_p, ctypes.c_int32, c_i32_p, c_double_p, c_i64_p,
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None
