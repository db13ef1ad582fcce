"""ctypes bindings to the native C++ runtime components (csrc/).

Native equivalents of the reference's non-CUDA native layer (the Cython
extensions ``triangle_hash.pyx`` / ``mise.pyx`` and the host-side data
loading).  The library is built on demand with ``make`` (g++); every
consumer has a pure-python fallback, so absence of a toolchain never
breaks the package.
"""

import ctypes
import os
import subprocess
import warnings

import numpy as np

__all__ = ['get_lib', 'TriangleHash', 'Mise', 'parse_obj']

_CSRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'csrc')
_LIB_PATH = os.path.join(_CSRC_DIR, 'libkaolin_tpu_native.so')
_lib = None
_lib_failed = False


def _build():
    subprocess.run(['make', '-C', _CSRC_DIR], check=True,
                   capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        # signatures
        lib.th_create.restype = ctypes.c_void_p
        lib.th_create.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int]
        lib.th_destroy.argtypes = [ctypes.c_void_p]
        lib.th_query_count.restype = ctypes.c_int64
        lib.th_query_count.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64]
        lib.th_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_void_p,
                                 ctypes.c_void_p]
        lib.mise_create.restype = ctypes.c_void_p
        lib.mise_create.argtypes = [ctypes.c_int64, ctypes.c_int64]
        lib.mise_destroy.argtypes = [ctypes.c_void_p]
        lib.mise_num_query.restype = ctypes.c_int64
        lib.mise_num_query.argtypes = [ctypes.c_void_p]
        lib.mise_get_query.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.mise_update.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.mise_refine.restype = ctypes.c_int64
        lib.mise_refine.argtypes = [ctypes.c_void_p]
        lib.mise_to_dense.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.obj_parse.restype = ctypes.c_void_p
        lib.obj_parse.argtypes = [ctypes.c_char_p]
        lib.obj_destroy.argtypes = [ctypes.c_void_p]
        lib.obj_counts.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.obj_copy.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 7
        _lib = lib
    except Exception as e:
        warnings.warn(f'native library unavailable ({e}); '
                      f'falling back to pure python')
        _lib_failed = True
    return _lib


def _ptr(arr):
    return arr.ctypes.data_as(ctypes.c_void_p)


class TriangleHash:
    """2D spatial hash over triangles (native; replaces
    ``triangle_hash.pyx``)."""

    def __init__(self, triangles, resolution=128):
        lib = get_lib()
        if lib is None:
            raise RuntimeError('native library unavailable')
        self._lib = lib
        self._tris = np.ascontiguousarray(triangles, dtype=np.float64)
        assert self._tris.ndim == 3 and self._tris.shape[1:] == (3, 2)
        self._h = lib.th_create(_ptr(self._tris), self._tris.shape[0],
                                int(resolution))

    def query(self, points):
        """Candidate (point_idx, tri_idx) pairs for (P, 2) points."""
        pts = np.ascontiguousarray(points, dtype=np.float64)
        n = self._lib.th_query_count(self._h, _ptr(pts), pts.shape[0])
        pidx = np.empty(n, dtype=np.int64)
        tidx = np.empty(n, dtype=np.int32)
        self._lib.th_query(self._h, _ptr(pts), pts.shape[0], _ptr(pidx),
                           _ptr(tidx))
        return pidx, tidx.astype(np.int64)

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.th_destroy(self._h)
            self._h = None


class Mise:
    """MISE octree refinement (native; replaces ``mise.pyx``).

    Usage::

        m = Mise(init_res, upsampling_steps)
        while True:
            pts = m.query()            # (N, 3) int coords, [0, R]
            if pts.shape[0] == 0 and not m.refine():
                break
            if pts.shape[0]:
                m.update(occupancy_at(pts))
        grid = m.to_dense()            # (R+1, R+1, R+1) uint8
    """

    def __init__(self, init_res, upsampling_steps):
        lib = get_lib()
        if lib is None:
            raise RuntimeError('native library unavailable')
        self._lib = lib
        self.final_resolution = init_res * (2 ** upsampling_steps)
        self._h = lib.mise_create(int(init_res), int(upsampling_steps))

    def query(self):
        n = self._lib.mise_num_query(self._h)
        out = np.empty((n, 3), dtype=np.int64)
        if n:
            self._lib.mise_get_query(self._h, _ptr(out))
        return out

    def update(self, occupancies):
        occ = np.ascontiguousarray(occupancies, dtype=np.uint8)
        self._lib.mise_update(self._h, _ptr(occ))

    def refine(self):
        return int(self._lib.mise_refine(self._h))

    def to_dense(self):
        side = self.final_resolution + 1
        out = np.empty((side, side, side), dtype=np.uint8)
        self._lib.mise_to_dense(self._h, _ptr(out))
        return out

    def __del__(self):
        if getattr(self, '_h', None):
            self._lib.mise_destroy(self._h)
            self._h = None


def parse_obj(path):
    """Fast native OBJ tokenization.

    Returns:
        dict with vertices (V, 3) f32, uvs (T, 2) f32, normals (N, 3) f32,
        face_counts (F,) i64, and flat raw (1-based, 0 = absent) indices
        face_v / face_vt / face_vn; or None if the native lib is missing.
    """
    lib = get_lib()
    if lib is None:
        return None
    h = lib.obj_parse(path.encode())
    if not h:
        raise IOError(f'failed to open {path!r}')
    try:
        counts = np.empty(5, dtype=np.int64)
        lib.obj_counts(h, _ptr(counts))
        nv, nt, nn, nf, nfv = (int(c) for c in counts)
        vertices = np.empty((nv, 3), dtype=np.float32)
        uvs = np.empty((nt, 2), dtype=np.float32)
        normals = np.empty((nn, 3), dtype=np.float32)
        face_counts = np.empty(nf, dtype=np.int64)
        face_v = np.empty(nfv, dtype=np.int64)
        face_vt = np.empty(nfv, dtype=np.int64)
        face_vn = np.empty(nfv, dtype=np.int64)
        lib.obj_copy(h, _ptr(vertices), _ptr(uvs), _ptr(normals),
                     _ptr(face_counts), _ptr(face_v), _ptr(face_vt),
                     _ptr(face_vn))
        return {'vertices': vertices, 'uvs': uvs, 'normals': normals,
                'face_counts': face_counts, 'face_v': face_v,
                'face_vt': face_vt, 'face_vn': face_vn}
    finally:
        lib.obj_destroy(h)
