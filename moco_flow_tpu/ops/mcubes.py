"""Host marching cubes: ctypes binding to the native C++ kernel.

Replaces the reference's PyMCubes dependency (trainer/trainer_nerf.py:249,
trainer_moco_flow.py:535). Compiled on demand with g++ -O3 and cached next to
the source; mesh extraction is offline so host CPU is the right place for it
(SURVEY.md §2.3).
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "native")
_SRC = osp.join(_NATIVE_DIR, "mcubes.cpp")
_LIB = None


def _build_lib() -> str:
    so_path = osp.join(_NATIVE_DIR, "libmcubes.so")
    if osp.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    subprocess.run(
        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
         _SRC, "-o", so_path],
        check=True, capture_output=True)
    return so_path


def _get_lib():
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_lib())
        lib.mc_marching_cubes.restype = ctypes.c_int
        lib.mc_marching_cubes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.mc_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def marching_cubes(grid: np.ndarray, isovalue: float):
    """Extract the isosurface of a (nx, ny, nz) scalar field.

    Returns (verts (V, 3) float32 in grid coordinates, tris (T, 3) int32),
    with shared vertices deduplicated — same contract as
    ``mcubes.marching_cubes``.
    """
    lib = _get_lib()
    grid = np.ascontiguousarray(grid, np.float32)
    nx, ny, nz = grid.shape
    verts_p = ctypes.POINTER(ctypes.c_float)()
    tris_p = ctypes.POINTER(ctypes.c_int32)()
    nv = ctypes.c_int()
    nt = ctypes.c_int()
    lib.mc_marching_cubes(
        grid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nx, ny, nz,
        ctypes.c_float(isovalue), ctypes.byref(verts_p), ctypes.byref(nv),
        ctypes.byref(tris_p), ctypes.byref(nt))
    try:
        verts = np.ctypeslib.as_array(verts_p, (nv.value, 3)).copy() \
            if nv.value else np.zeros((0, 3), np.float32)
        tris = np.ctypeslib.as_array(tris_p, (nt.value, 3)).copy() \
            if nt.value else np.zeros((0, 3), np.int32)
    finally:
        lib.mc_free(verts_p)
        lib.mc_free(tris_p)
    return verts, tris


def export_obj(verts: np.ndarray, tris: np.ndarray, path: str):
    """Minimal OBJ writer (replaces mcubes.export_obj)."""
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for t in tris:
            f.write(f"f {t[0] + 1} {t[1] + 1} {t[2] + 1}\n")
