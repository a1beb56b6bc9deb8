"""ctypes bindings for the native (C++) runtime components.

The reference's entire runtime is C++; here the host-side heavy lifting
(BVH build, OBJ parsing) has native implementations in native/*.cpp with
pure-Python fallbacks (ops/bvh.py, scene/obj.py) that define the semantics.
The shared library is built on first use (g++, ~1s) and cached.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libplutracer_native.so"
_lib = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"],
                cwd=_NATIVE_DIR,
                check=True,
                capture_output=True,
                timeout=120,
            )
        except (subprocess.SubprocessError, OSError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        _build_failed = True
        return None

    lib.plu_build_bvh.restype = ctypes.c_int
    lib.plu_build_bvh.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.plu_load_obj.restype = ctypes.c_int
    lib.plu_load_obj.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.plu_free.restype = None
    lib.plu_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _ensure_built() is not None


def build_bvh_native(prims10: np.ndarray):
    """prims10: (P, 10) f32 [type a b c]. Returns (node_min, node_max,
    node_skip, node_prim) numpy arrays, or None if the library is missing."""
    lib = _ensure_built()
    if lib is None:
        return None
    prims10 = np.ascontiguousarray(prims10, np.float32)
    P = prims10.shape[0]
    N = 2 * P - 1
    node_min = np.zeros((N, 3), np.float32)
    node_max = np.zeros((N, 3), np.float32)
    node_skip = np.zeros(N, np.int32)
    node_prim = np.zeros(N, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    n = lib.plu_build_bvh(
        prims10.ctypes.data_as(fp),
        P,
        node_min.ctypes.data_as(fp),
        node_max.ctypes.data_as(fp),
        node_skip.ctypes.data_as(ip),
        node_prim.ctypes.data_as(ip),
    )
    if n != N:
        return None
    return node_min, node_max, node_skip, node_prim


def load_obj_native(path: str):
    """Returns (positions (F,3,3), normals (F,3,3), uvs (F,3,2)) or None."""
    lib = _ensure_built()
    if lib is None:
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    pos_p, norm_p, uv_p = fp(), fp(), fp()
    nf = ctypes.c_int(0)
    rc = lib.plu_load_obj(
        path.encode(),
        ctypes.byref(pos_p),
        ctypes.byref(norm_p),
        ctypes.byref(uv_p),
        ctypes.byref(nf),
    )
    if rc != 0:
        return None
    F = nf.value
    try:
        pos = np.ctypeslib.as_array(pos_p, (F, 3, 3)).copy()
        norm = np.ctypeslib.as_array(norm_p, (F, 3, 3)).copy()
        uv = np.ctypeslib.as_array(uv_p, (F, 3, 2)).copy()
    finally:
        lib.plu_free(pos_p)
        lib.plu_free(norm_p)
        lib.plu_free(uv_p)
    return pos, norm, uv
