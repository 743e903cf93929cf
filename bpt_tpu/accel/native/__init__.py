"""ctypes loader for the native BVH builder (compiles on first use)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "bvh_builder.cpp")
_SO = os.path.join(_HERE, "libbvh_builder.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _compile() -> None:
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True,
        capture_output=True,
    )


def load() -> Optional[ctypes.CDLL]:
    """The shared library, compiling it if needed; None if unavailable."""
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
                _compile()
            lib = ctypes.CDLL(_SO)
            argtypes = [
                ctypes.POINTER(ctypes.c_float),  # aabb_min
                ctypes.POINTER(ctypes.c_float),  # aabb_max
                ctypes.c_int64,  # n_tris
                ctypes.POINTER(ctypes.c_int32),  # node_tri
                ctypes.POINTER(ctypes.c_int32),  # node_right
                ctypes.POINTER(ctypes.c_float),  # node_min
                ctypes.POINTER(ctypes.c_float),  # node_max
                ctypes.POINTER(ctypes.c_int32),  # max_depth out
            ]
            lib.bvh_build.restype = ctypes.c_int
            lib.bvh_build.argtypes = argtypes
            lib.bvh_build_sah.restype = ctypes.c_int
            lib.bvh_build_sah.argtypes = argtypes
            _lib = lib
        except Exception:
            _failed = True
        return _lib
