"""ctypes bindings for the native host-geometry library (native/ngp_host.cpp).

The reference implements its acceleration-structure builders natively
(``src/triangle_bvh.cu:541`` CPU BVH build, ``triangle_octree.cuh:46-382``);
this package loads the C++ counterparts and exposes them with numpy
signatures identical to the pure-Python builders in ``ngp_tpu/geometry/``
— same algorithms, same traversal order, bit-identical outputs — so
callers can prefer native and fall back transparently.

``load()`` compiles the library on first use (g++, a few seconds) and
caches the handle; set ``NGP_TPU_NO_NATIVE=1`` to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libngp_host.so")
_SRC = os.path.join(os.path.dirname(os.path.dirname(_HERE)), "native", "ngp_host.cpp")

_i64 = ctypes.c_int64
_i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-fPIC", "-shared", "-pthread",
             "-o", _SO, _SRC],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The library handle, building it if needed; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("NGP_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) or (
        os.path.exists(_SRC)
        and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
    ):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None

    lib.ngp_bvh_build.restype = ctypes.c_void_p
    lib.ngp_bvh_build.argtypes = [_f32p, _i64, ctypes.c_int]
    lib.ngp_bvh_n_nodes.restype = _i64
    lib.ngp_bvh_n_nodes.argtypes = [ctypes.c_void_p]
    lib.ngp_bvh_n_padded.restype = _i64
    lib.ngp_bvh_n_padded.argtypes = [ctypes.c_void_p]
    lib.ngp_bvh_copy.restype = None
    lib.ngp_bvh_copy.argtypes = [ctypes.c_void_p, _f32p, _f32p, _i32p, _i32p,
                                 _u8p, _f32p, _f32p, _i32p]
    lib.ngp_bvh_free.restype = None
    lib.ngp_bvh_free.argtypes = [ctypes.c_void_p]

    lib.ngp_octree_build.restype = ctypes.c_void_p
    lib.ngp_octree_build.argtypes = [_f64p, _i64, ctypes.c_int]
    lib.ngp_octree_level_size.restype = _i64
    lib.ngp_octree_level_size.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.ngp_octree_copy_level.restype = None
    lib.ngp_octree_copy_level.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                          _i32p, _i32p]
    lib.ngp_octree_n_vertices.restype = _i64
    lib.ngp_octree_n_vertices.argtypes = [ctypes.c_void_p]
    lib.ngp_octree_free.restype = None
    lib.ngp_octree_free.argtypes = [ctypes.c_void_p]

    lib.ngp_chessboard_dt.restype = None
    lib.ngp_chessboard_dt.argtypes = [_u8p, ctypes.c_int, _i32p]

    _LIB = lib
    return _LIB


def bvh_build(triangles: np.ndarray, leaf_size: int):
    """Native BVH build; returns the same component arrays as the numpy
    builder (node_min, node_max, node_a, node_b, node_leaf, tris, normals,
    tri_index) or None when the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles.reshape(-1, 9), np.float32)
    h = lib.ngp_bvh_build(tris, tris.shape[0], leaf_size)
    try:
        m = int(lib.ngp_bvh_n_nodes(h))
        tp = int(lib.ngp_bvh_n_padded(h))
        node_min = np.empty((m, 3), np.float32)
        node_max = np.empty((m, 3), np.float32)
        node_a = np.empty((m,), np.int32)
        node_b = np.empty((m,), np.int32)
        node_leaf = np.empty((m,), np.uint8)
        out_tris = np.empty((tp, 9), np.float32)
        normals = np.empty((tp, 3), np.float32)
        tri_index = np.empty((tp,), np.int32)
        lib.ngp_bvh_copy(h, node_min, node_max, node_a, node_b, node_leaf,
                         out_tris, normals, tri_index)
    finally:
        lib.ngp_bvh_free(h)
    return (node_min, node_max, node_a, node_b, node_leaf.astype(bool),
            out_tris.reshape(tp, 3, 3), normals, tri_index)


def octree_build(triangles: np.ndarray, max_depth: int):
    """Native octree refinement; returns (codes_per_depth, verts_per_depth,
    n_vertices) with the exact layout of TriangleOctree.build, or None."""
    lib = load()
    if lib is None:
        return None
    tris = np.ascontiguousarray(triangles.reshape(-1, 9), np.float64)
    h = lib.ngp_octree_build(tris, tris.shape[0], max_depth)
    try:
        codes, verts = [], []
        for d in range(max_depth):
            n = int(lib.ngp_octree_level_size(h, d))
            c = np.empty((n,), np.int32)
            v = np.empty((n, 8), np.int32)
            lib.ngp_octree_copy_level(h, d, c, v)
            codes.append(c)
            verts.append(v)
        n_vertices = int(lib.ngp_octree_n_vertices(h))
    finally:
        lib.ngp_octree_free(h)
    return codes, verts, n_vertices


def chessboard_dt(occ: np.ndarray):
    """Native exact L∞ distance transform (two chamfer sweeps); None if
    the library is unavailable."""
    lib = load()
    if lib is None:
        return None
    g = occ.shape[0]
    out = np.empty((g, g, g), np.int32)
    lib.ngp_chessboard_dt(np.ascontiguousarray(occ, np.uint8), g, out)
    return out
