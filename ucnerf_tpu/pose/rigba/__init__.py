"""ctypes bindings for the native rig bundle adjuster.

The shared library is built on demand with g++ (no pybind11 in this image);
the C API operates on flat float64/int32 numpy arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "rigba.cc")
_LIB = os.path.join(os.path.dirname(__file__), "librigba.so")
_lib = None


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_LIB)
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    up = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.rigba_solve.restype = ctypes.c_int
    lib.rigba_solve.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp, dp, ip, ip, ip, dp,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_double, ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
    ]
    lib.rigba_triangulate.restype = ctypes.c_int
    lib.rigba_triangulate.argtypes = [
        ctypes.c_int, ctypes.c_int, ip, ip, ip, dp, dp, dp, dp, dp, dp,
        ctypes.c_int, ctypes.c_int, ctypes.c_double, dp, up,
    ]
    _lib = lib
    return lib


def solve(rig_qvecs, rig_tvecs, rel_qvecs, rel_tvecs, points, intrinsics,
          obs_snapshot, obs_camera, obs_point, obs_xy, *,
          fix_rig_poses=False, fix_rel_rot=False, fix_rel_trans=False,
          fix_points=False, ref_camera=0, max_iterations=50,
          huber_delta=4.0, verbose=False):
    """Run the rig BA in place; returns the final robust cost.

    The UC-NeRF configuration (`fix_trans_refine_rot`,
    bundle_adjustment.cc:1055-1061) is fix_rel_trans=True with relative
    rotations free.
    """
    lib = _load()
    arrs = dict(
        rig_qvecs=np.ascontiguousarray(rig_qvecs, np.float64),
        rig_tvecs=np.ascontiguousarray(rig_tvecs, np.float64),
        rel_qvecs=np.ascontiguousarray(rel_qvecs, np.float64),
        rel_tvecs=np.ascontiguousarray(rel_tvecs, np.float64),
        points=np.ascontiguousarray(points, np.float64),
    )
    intr = np.ascontiguousarray(intrinsics, np.float64)
    osn = np.ascontiguousarray(obs_snapshot, np.int32)
    oca = np.ascontiguousarray(obs_camera, np.int32)
    opt = np.ascontiguousarray(obs_point, np.int32)
    oxy = np.ascontiguousarray(obs_xy, np.float64)
    cost = ctypes.c_double(0.0)
    ret = lib.rigba_solve(
        len(arrs["rig_qvecs"]), len(arrs["rel_qvecs"]), len(arrs["points"]),
        len(oxy), arrs["rig_qvecs"], arrs["rig_tvecs"], arrs["rel_qvecs"],
        arrs["rel_tvecs"], arrs["points"], intr, osn, oca, opt, oxy,
        int(fix_rig_poses), int(fix_rel_rot), int(fix_rel_trans),
        int(fix_points), int(ref_camera), int(max_iterations),
        float(huber_delta), int(verbose), ctypes.byref(cost))
    if ret != 0:
        raise RuntimeError(f"rigba_solve failed: {ret}")
    return (arrs["rig_qvecs"], arrs["rig_tvecs"], arrs["rel_qvecs"],
            arrs["rel_tvecs"], arrs["points"], cost.value)


def triangulate(num_points, obs_snapshot, obs_camera, obs_point, obs_xy,
                rig_qvecs, rig_tvecs, rel_qvecs, rel_tvecs, intrinsics,
                max_error=4.0):
    """DLT triangulation with fixed poses; returns (points, valid_mask)."""
    lib = _load()
    osn = np.ascontiguousarray(obs_snapshot, np.int32)
    oca = np.ascontiguousarray(obs_camera, np.int32)
    opt = np.ascontiguousarray(obs_point, np.int32)
    oxy = np.ascontiguousarray(obs_xy, np.float64)
    rq = np.ascontiguousarray(rig_qvecs, np.float64)
    rt = np.ascontiguousarray(rig_tvecs, np.float64)
    cq = np.ascontiguousarray(rel_qvecs, np.float64)
    ct = np.ascontiguousarray(rel_tvecs, np.float64)
    intr = np.ascontiguousarray(intrinsics, np.float64)
    pts = np.zeros((num_points, 3), np.float64)
    valid = np.zeros(num_points, np.uint8)
    lib.rigba_triangulate(num_points, len(oxy), osn, oca, opt, oxy, rq, rt,
                          cq, ct, intr, len(rq), len(cq), float(max_error),
                          pts, valid)
    return pts, valid.astype(bool)
