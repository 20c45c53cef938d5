"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its one native component (the CUDA hash encoder,
code/hashencoder/src/) JIT-compiled at import via torch cpp_extension
(code/hashencoder/backend.py:10-22). Here the TPU compute path is pure
JAX/XLA, so the native layer instead covers the *host* runtime hot spots —
currently iso-surface extraction (marching tetrahedra), which at 512^3-4096^3
mesh resolutions (reference eval protocol, scripts/extract_all_meshes...:56-64)
is host-bound. Compilation is lazy (first use), cached next to the source,
and every native entry point has a pure-NumPy fallback, so the package works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_LIB_FAILED = False


def _build_and_load() -> ctypes.CDLL | None:
    src = os.path.join(_SRC_DIR, "marching_tets.cpp")
    cache_dir = os.environ.get(
        "MONOSDF_TPU_NATIVE_CACHE",
        os.path.join(tempfile.gettempdir(), "monosdf_tpu_native"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    lib_path = os.path.join(cache_dir, "libmonosdf_native.so")

    if not (
        os.path.exists(lib_path)
        and os.path.getmtime(lib_path) >= os.path.getmtime(src)
    ):
        cmd = [
            os.environ.get("CXX", "g++"),
            "-O3", "-std=c++17", "-shared", "-fPIC", "-o", lib_path + ".tmp", src,
        ]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(lib_path + ".tmp", lib_path)

    lib = ctypes.CDLL(lib_path)
    lib.mt_extract.restype = ctypes.c_int
    lib.mt_extract.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # sdf
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),  # origin
        ctypes.POINTER(ctypes.c_float),  # spacing
        ctypes.c_float,                  # level
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.mt_free.restype = None
    lib.mt_free.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64)
    ]
    return lib


def get_native_lib() -> ctypes.CDLL | None:
    """The compiled native library, or None if unavailable (no toolchain)."""
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    with _LOCK:
        if _LIB is None and not _LIB_FAILED:
            try:
                _LIB = _build_and_load()
            except Exception:
                _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return get_native_lib() is not None


def marching_tetrahedra_native(
    sdf: np.ndarray, origin, spacing, level: float = 0.0
):
    """Native marching tetrahedra with welded (deduplicated) vertices.

    Same decomposition/case analysis as meshing.marching.marching_tetrahedra;
    returns (verts (V,3) float32, faces (F,3) int64). Raises RuntimeError if
    the native library is unavailable — callers use native_available() or the
    dispatching wrapper in meshing.marching.
    """
    lib = get_native_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")

    sdf = np.ascontiguousarray(sdf, np.float32)
    origin = np.ascontiguousarray(
        np.broadcast_to(np.asarray(origin, np.float32), (3,))
    )
    spacing = np.ascontiguousarray(
        np.broadcast_to(np.asarray(spacing, np.float32), (3,))
    )
    nx, ny, nz = sdf.shape

    verts_p = ctypes.POINTER(ctypes.c_float)()
    faces_p = ctypes.POINTER(ctypes.c_int64)()
    nv = ctypes.c_int64(0)
    nf = ctypes.c_int64(0)
    rc = lib.mt_extract(
        sdf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nx, ny, nz,
        origin.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        spacing.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(level),
        ctypes.byref(verts_p), ctypes.byref(faces_p),
        ctypes.byref(nv), ctypes.byref(nf),
    )
    if rc != 0:
        raise RuntimeError(f"mt_extract failed with code {rc}")
    try:
        if nv.value == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).astype(
            np.float32, copy=True
        )
        if nf.value == 0:
            faces = np.zeros((0, 3), np.int64)
        else:
            faces = np.ctypeslib.as_array(faces_p, (nf.value, 3)).astype(
                np.int64, copy=True
            )
    finally:
        lib.mt_free(verts_p, faces_p)
    return verts, faces
