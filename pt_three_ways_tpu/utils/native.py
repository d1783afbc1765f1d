"""ctypes bindings for the native host-runtime library (csrc/pt3native.cpp).

Builds lazily with make if the .so is missing and a compiler is available;
every entry point has a pure-Python fallback, so the framework works without
the native library (``PT3_NO_NATIVE=1`` forces the fallbacks).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "libpt3native.so")


def _csrc_dir() -> str:
    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    return os.path.join(root, "csrc")


def load() -> Optional[ctypes.CDLL]:
    """Returns the native library, building it on first use if possible."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("PT3_NO_NATIVE"):
        return None
    path = _lib_path()
    if not os.path.exists(path):
        try:
            subprocess.run(
                ["make", "-s"], cwd=_csrc_dir(), check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    lib.pt3_obj_parse.restype = ctypes.c_void_p
    lib.pt3_obj_parse.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.pt3_obj_error.restype = ctypes.c_char_p
    lib.pt3_obj_error.argtypes = [ctypes.c_void_p]
    lib.pt3_obj_num_tris.restype = ctypes.c_int64
    lib.pt3_obj_num_tris.argtypes = [ctypes.c_void_p]
    lib.pt3_obj_num_mats.restype = ctypes.c_int64
    lib.pt3_obj_num_mats.argtypes = [ctypes.c_void_p]
    lib.pt3_obj_copy.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.pt3_obj_free.argtypes = [ctypes.c_void_p]
    lib.pt3_morton_order.argtypes = [
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.pt3_raw_merge.restype = ctypes.c_int32
    lib.pt3_raw_merge.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int32,
        ctypes.c_char_p,
        ctypes.c_char_p,
        ctypes.c_int32,
    ]
    _LIB = lib
    return _LIB


def parse_obj_native(obj_path: str, mtl_dir: str):
    """Native OBJ/MTL parse -> (verts [n,3,3] f64, mat_ids [n] i32,
    mats [m,9] f64) or None if the library is unavailable. Raises ValueError
    with the reference's error wording on malformed input."""
    lib = load()
    if lib is None:
        return None
    handle = lib.pt3_obj_parse(obj_path.encode(), mtl_dir.encode())
    try:
        err = lib.pt3_obj_error(handle)
        if err:
            raise ValueError(err.decode())
        n = lib.pt3_obj_num_tris(handle)
        m = lib.pt3_obj_num_mats(handle)
        verts = np.empty((n, 3, 3), np.float64)
        mat_ids = np.empty((n,), np.int32)
        mats = np.empty((max(m, 1), 9), np.float64)
        if n:
            lib.pt3_obj_copy(handle, verts.reshape(-1), mat_ids, mats.reshape(-1))
        return verts, mat_ids, mats[:m]
    finally:
        lib.pt3_obj_free(handle)


def morton_order(points: np.ndarray) -> np.ndarray:
    """Spatial (Morton) ordering permutation for [n, 3] points."""
    pts = np.ascontiguousarray(points, np.float64)
    n = pts.shape[0]
    lib = load()
    if lib is not None:
        order = np.empty((n,), np.int32)
        lib.pt3_morton_order(pts.reshape(-1), n, order)
        return order
    # Python fallback
    lo = pts.min(0)
    rng = np.where(pts.max(0) - lo > 0, pts.max(0) - lo, 1.0)
    q = np.clip(((pts - lo) / rng) * 1023.0, 0, 1023).astype(np.uint32)

    def expand(v):
        v = (v * np.uint32(0x00010001)) & np.uint32(0xFF0000FF)
        v = (v * np.uint32(0x00000101)) & np.uint32(0x0F00F00F)
        v = (v * np.uint32(0x00000011)) & np.uint32(0xC30C30C3)
        v = (v * np.uint32(0x00000005)) & np.uint32(0x49249249)
        return v

    code = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    return np.argsort(code, kind="stable").astype(np.int32)


def raw_merge_native(paths, out_path: str) -> bool:
    """Native multi-file raw merge; returns False if unavailable."""
    lib = load()
    if lib is None:
        return False
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    err = ctypes.create_string_buffer(512)
    rc = lib.pt3_raw_merge(arr, len(paths), out_path.encode(), err, 512)
    if rc != 0:
        raise IOError(err.value.decode())
    return True
