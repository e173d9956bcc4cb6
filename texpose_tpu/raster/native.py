"""ctypes loader for the native C++ rasterizer (csrc/raster.cpp).

The shared library is built lazily with g++ on first use and cached next to
the source (keyed by source mtime).  This is the host-side production path
for the preprocessing CLIs — the same role PyTorch3D's compiled rasterizer
plays in the reference (tools/mvrenderer.py:12-27).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "csrc", "raster.cpp")
_LIB_PATH = os.path.join(_HERE, "csrc", "_raster.so")
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
           "-o", _LIB_PATH + ".tmp", _SRC]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(_LIB_PATH + ".tmp", _LIB_PATH)


def load_library():
    """Build (if stale) and load the rasterizer library; returns None if no
    toolchain is available."""
    global _lib
    if _lib is not None:
        return _lib
    try:
        if (not os.path.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
    except Exception:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rasterize_mesh.argtypes = [
        f32p, i32p, ctypes.c_int32, ctypes.c_int32, f32p,
        ctypes.c_int32, ctypes.c_int32, f32p, i32p, f32p]
    lib.rasterize_mesh.restype = None
    lib.interpolate_attributes.argtypes = [
        i32p, i32p, f32p, f32p, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, f32p]
    lib.interpolate_attributes.restype = None
    _lib = lib
    return lib


def available():
    return load_library() is not None


def _ptr(a, t):
    return a.ctypes.data_as(t)


def rasterize(verts_cam, faces, K, H, W):
    """verts_cam [V,3] f32 camera-frame, faces [F,3] i32, K [3,3] →
    (zbuf [H,W], face_id [H,W] (-1 = bg), bary [H,W,3])."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (no g++?)")
    verts_cam = np.ascontiguousarray(verts_cam, np.float32)
    faces = np.ascontiguousarray(faces, np.int32)
    K = np.ascontiguousarray(K, np.float32).reshape(9)
    zbuf = np.zeros((H, W), np.float32)
    face_id = np.full((H, W), -1, np.int32)
    bary = np.zeros((H, W, 3), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rasterize_mesh(
        _ptr(verts_cam, f32p), _ptr(faces, i32p),
        np.int32(len(verts_cam)), np.int32(len(faces)), _ptr(K, f32p),
        np.int32(H), np.int32(W),
        _ptr(zbuf, f32p), _ptr(face_id, i32p), _ptr(bary, f32p))
    return zbuf, face_id, bary


def interpolate(faces, face_id, bary, attrs):
    """Per-vertex attrs [V,C] interpolated at rasterized pixels →
    [H,W,C] (0 at background)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable (no g++?)")
    faces = np.ascontiguousarray(faces, np.int32)
    face_id = np.ascontiguousarray(face_id, np.int32)
    bary = np.ascontiguousarray(bary, np.float32)
    attrs = np.ascontiguousarray(attrs, np.float32)
    H, W = face_id.shape
    C = attrs.shape[1]
    out = np.zeros((H, W, C), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.interpolate_attributes(
        _ptr(faces, i32p), _ptr(face_id, i32p), _ptr(bary, f32p),
        _ptr(attrs, f32p), np.int32(len(faces)), np.int32(C),
        np.int32(H), np.int32(W), _ptr(out, f32p))
    return out
