"""ctypes bindings for the native host data-path kernels.

Compiles ``native/pcm_native.cpp`` on first use (g++ -O3 -fopenmp, cached
next to the source) and exposes the fused voxel-subsample path used by
``GridSamplePCD``. Falls back silently to the numpy implementation when no
toolchain or compiled library is available — the framework never *requires*
the native path, it's a host-CPU throughput optimization (the reference gets
the same from torch's C++ DataLoader machinery).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from pointcloudmatters_tpu.utils.pylogger import RankedLogger

log = RankedLogger(__name__, rank_zero_only=True)

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "pcm_native.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "libpcm_native.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_U64P = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _compile() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:
        log.info(f"native build unavailable ({e}); using numpy data path")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
        ):
            if not os.path.exists(_SRC) or not _compile():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
            lib.pcm_fnv_hash.argtypes = [
                _I64P, ctypes.c_int64, ctypes.c_int64, _U64P]
            lib.pcm_grid_subsample_train.argtypes = [
                _I64P, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, _I64P]
            lib.pcm_grid_subsample_train.restype = ctypes.c_int64
            lib.pcm_grid_segments.argtypes = [
                _I64P, ctypes.c_int64, ctypes.c_int64, _I64P, _I64P, _I64P]
            lib.pcm_grid_segments.restype = ctypes.c_int64
            _lib = lib
            log.info(f"native data path loaded: {_LIB}")
        except OSError as e:
            log.info(f"native lib load failed ({e}); using numpy data path")
        return _lib


def available() -> bool:
    return get_lib() is not None


def fnv_hash(coords: np.ndarray) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(coords, np.int64)
    out = np.empty(coords.shape[0], np.uint64)
    lib.pcm_fnv_hash(coords, coords.shape[0], coords.shape[1], out)
    return out


def grid_subsample_train(grid_coord: np.ndarray,
                         seed: Optional[int] = None) -> Optional[np.ndarray]:
    """One fused pass: hash + sort + segment + random-pick-per-voxel.
    Returns original-point indices (n_voxels,), or None without the lib."""
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(grid_coord, np.int64)
    idx = np.empty(coords.shape[0], np.int64)
    if seed is None:
        seed = int(np.random.randint(0, 2**63 - 1))
    n = lib.pcm_grid_subsample_train(
        coords, coords.shape[0], coords.shape[1], ctypes.c_uint64(seed), idx
    )
    return idx[:n]


def grid_segments(grid_coord: np.ndarray):
    """(order, starts, counts) over hash-sorted voxels, or None."""
    lib = get_lib()
    if lib is None:
        return None
    coords = np.ascontiguousarray(grid_coord, np.int64)
    n = coords.shape[0]
    order = np.empty(n, np.int64)
    starts = np.empty(n, np.int64)
    counts = np.empty(n, np.int64)
    n_vox = lib.pcm_grid_segments(coords, n, coords.shape[1], order, starts, counts)
    return order, starts[:n_vox], counts[:n_vox]
