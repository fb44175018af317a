"""ctypes binding for the native (C++) preprocessing kernels.

Auto-builds ``libtsue_native.so`` from native/ on first import when a
compiler is available; falls back to None (callers use the NumPy path)
otherwise.  See native/window_builder.cpp for the C ABI.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libtsue_native.so")
_SRC_DIR = os.path.normpath(os.path.join(_HERE, "..", "..", "native"))

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.path.isdir(_SRC_DIR):
        # run make unconditionally: it is incremental, and skipping it
        # when a stale .so exists would silently ignore source edits
        try:
            subprocess.run(["make", "-C", _SRC_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            pass  # fall through: a previously built .so may still work
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.tsue_is_abnormal.restype = ctypes.c_int
    lib.tsue_is_abnormal.argtypes = [f32p, ctypes.c_int64, ctypes.c_float,
                                     ctypes.c_float, ctypes.c_int]
    lib.tsue_build_windows.restype = ctypes.c_int64
    lib.tsue_build_windows.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, f32p, f32p, f32p, i64p,
        ctypes.c_int64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def is_abnormal(traj: np.ndarray, max_step: float, max_speed_diff: float,
                direction: Optional[str]) -> bool:
    lib = _load()
    assert lib is not None
    traj = np.ascontiguousarray(traj, np.float32)
    d = {"R2L": 1, "L2R": 2}.get(direction or "", 0)
    return bool(lib.tsue_is_abnormal(traj, traj.shape[0], max_step,
                                     max_speed_diff, d))


def build_track_windows(traj: np.ndarray, seq_len: int, out_len: int,
                        stride: int, min_range_x: float
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                   np.ndarray]:
    """Returns (traj_in (C,2,T_in), traj_out (C,2,T_out), norm_stat (C,4),
    starts (C,)) for one downsampled track."""
    lib = _load()
    assert lib is not None
    traj = np.ascontiguousarray(traj, np.float32)
    n = traj.shape[0]
    win = seq_len + out_len
    max_w = max((n - win) // stride + 1, 0) if n >= win else 0
    if max_w == 0:
        return (np.zeros((0, 2, seq_len), np.float32),
                np.zeros((0, 2, out_len), np.float32),
                np.zeros((0, 4), np.float32), np.zeros((0,), np.int64))
    in_out = np.empty((max_w, 2, seq_len), np.float32)
    out_out = np.empty((max_w, 2, out_len), np.float32)
    stat = np.empty((max_w, 4), np.float32)
    starts = np.empty((max_w,), np.int64)
    c = lib.tsue_build_windows(traj, n, seq_len, out_len, stride,
                               min_range_x, in_out.reshape(-1),
                               out_out.reshape(-1), stat.reshape(-1),
                               starts, max_w)
    return in_out[:c], out_out[:c], stat[:c], starts[:c]
