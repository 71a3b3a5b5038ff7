"""ctypes bindings for the native C++ runtime (native/libdpt_native.so).

The native library implements the host-side hot paths — OBJ parsing and BVH
construction (the reference's native surface: tiny_obj_loader.h and
BoundingVolumeHierarchy.cpp) — in C++ with the exact same output contract as
the numpy fallbacks.  Missing library → callers fall back silently.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg)
    # Installed wheel location first (`make -C native install` copies it to
    # dpt_tpu/_native/, pyproject package-data ships it), then the in-repo
    # build output for source checkouts.
    candidates = [
        os.path.join(pkg, "_native", "libdpt_native.so"),
        os.path.join(repo, "native", "libdpt_native.so"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.dpt_build_bvh.restype = ctypes.c_int
        lib.dpt_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float),  # vertices [V*3]
            ctypes.c_int,  # V
            ctypes.POINTER(ctypes.c_int),  # indices [T*3]
            ctypes.c_int,  # T
            ctypes.c_int,  # leaf_size
            ctypes.POINTER(ctypes.c_float),  # out node_min [max_nodes*3]
            ctypes.POINTER(ctypes.c_float),  # out node_max
            ctypes.POINTER(ctypes.c_int),  # out node_left
            ctypes.POINTER(ctypes.c_int),  # out node_right
            ctypes.POINTER(ctypes.c_int),  # out tri_order [T]
        ]
        try:  # absent in .so builds predating the SAH builder
            lib.dpt_build_bvh_sah.restype = ctypes.c_int
            lib.dpt_build_bvh_sah.argtypes = [
                ctypes.POINTER(ctypes.c_float),  # vertices [V*3]
                ctypes.c_int,  # V
                ctypes.POINTER(ctypes.c_int),  # indices [T*3]
                ctypes.c_int,  # T
                ctypes.c_int,  # leaf_size
                ctypes.c_int,  # n_bins
                ctypes.POINTER(ctypes.c_float),  # out node_min
                ctypes.POINTER(ctypes.c_float),  # out node_max
                ctypes.POINTER(ctypes.c_int),  # out node_left
                ctypes.POINTER(ctypes.c_int),  # out node_right
                ctypes.POINTER(ctypes.c_int),  # out tri_order [T]
            ]
        except AttributeError:
            pass
        lib.dpt_load_obj_counts.restype = ctypes.c_int
        lib.dpt_load_obj_counts.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),  # out n_vertices
            ctypes.POINTER(ctypes.c_int),  # out n_triangles
        ]
        lib.dpt_load_obj_fill.restype = ctypes.c_int
        lib.dpt_load_obj_fill.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),  # out vertices
            ctypes.POINTER(ctypes.c_int),  # out indices
            ctypes.POINTER(ctypes.c_float),  # out uvs [T*3*2]
            ctypes.POINTER(ctypes.c_int),  # out mat_idx [T]
        ]
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _lib() is not None


def native_build_bvh(vertices: np.ndarray, indices: np.ndarray, leaf_size: int):
    """Returns (node_min, node_max, node_left, node_right, tri_order) numpy
    arrays, or None if the native library is unavailable."""
    lib = _lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    n_tri = idx.shape[0]
    max_nodes = max(2 * n_tri - 1, 1)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_left = np.empty(max_nodes, np.int32)
    node_right = np.empty(max_nodes, np.int32)
    tri_order = np.empty(n_tri, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = lib.dpt_build_bvh(
        v.ctypes.data_as(fp), v.shape[0],
        idx.ctypes.data_as(ip), n_tri, leaf_size,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        node_left.ctypes.data_as(ip), node_right.ctypes.data_as(ip),
        tri_order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        raise RuntimeError(
            f"native BVH build failed (rc={n_nodes}) for {n_tri} triangles"
        )
    return (
        node_min[:n_nodes], node_max[:n_nodes],
        node_left[:n_nodes], node_right[:n_nodes], tri_order,
    )


def native_build_bvh_sah(vertices: np.ndarray, indices: np.ndarray,
                         leaf_size: int, n_bins: int = 16):
    """Binned-SAH twin of accel/bvh.build_bvh_sah with bit-identical output.
    Returns (node_min, node_max, node_left, node_right, tri_order) or None
    if the native library is unavailable."""
    lib = _lib()
    if lib is None or not hasattr(lib, "dpt_build_bvh_sah"):
        return None
    v = np.ascontiguousarray(vertices, np.float32)
    idx = np.ascontiguousarray(indices, np.int32)
    n_tri = idx.shape[0]
    max_nodes = max(2 * n_tri - 1, 1)
    node_min = np.empty((max_nodes, 3), np.float32)
    node_max = np.empty((max_nodes, 3), np.float32)
    node_left = np.empty(max_nodes, np.int32)
    node_right = np.empty(max_nodes, np.int32)
    tri_order = np.empty(n_tri, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    n_nodes = lib.dpt_build_bvh_sah(
        v.ctypes.data_as(fp), v.shape[0],
        idx.ctypes.data_as(ip), n_tri, leaf_size, n_bins,
        node_min.ctypes.data_as(fp), node_max.ctypes.data_as(fp),
        node_left.ctypes.data_as(ip), node_right.ctypes.data_as(ip),
        tri_order.ctypes.data_as(ip),
    )
    if n_nodes <= 0:
        raise RuntimeError(
            f"native SAH BVH build failed (rc={n_nodes}) for {n_tri} triangles"
        )
    return (
        node_min[:n_nodes], node_max[:n_nodes],
        node_left[:n_nodes], node_right[:n_nodes], tri_order,
    )


def native_load_obj(path: str):
    """Returns (vertices [V,3] f32, indices [T,3] i32, uvs [T,3,2] f32,
    mat_idx [T] i32) or None."""
    lib = _lib()
    if lib is None:
        return None
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    if lib.dpt_load_obj_counts(path.encode(), ctypes.byref(nv), ctypes.byref(nt)) != 0:
        raise RuntimeError(f"native OBJ parse failed for {path!r}")
    V, T = nv.value, nt.value
    vertices = np.empty((V, 3), np.float32)
    indices = np.empty((T, 3), np.int32)
    uvs = np.empty((T, 3, 2), np.float32)
    mat_idx = np.empty(T, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int)
    if lib.dpt_load_obj_fill(
        path.encode(),
        vertices.ctypes.data_as(fp), indices.ctypes.data_as(ip),
        uvs.ctypes.data_as(fp), mat_idx.ctypes.data_as(ip),
    ) != 0:
        raise RuntimeError(f"native OBJ fill failed for {path!r}")
    return vertices, indices, uvs, mat_idx
