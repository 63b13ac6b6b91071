"""ctypes bindings for the native host-side IO library.

The reference ships a compiled C++ helper library next to its
header-only core (src/small_gicp/...); the TPU framework's compiled
piece is the host data path: scan parsing and a prefetching dataset
loader that keeps the chip fed (io_native.cpp). The .so is built on
first use with g++ (no pip/pybind11); every entry point has a pure
numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "io_native.cpp")
_SO = os.path.join(_DIR, "_io_native.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lib_lock:
        if _lib is not None:
            return _lib
        try:
            if (not os.path.exists(_SO)) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)
            ):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-pthread", _SRC, "-o", _SO],
                    check=True,
                    capture_output=True,
                )
            lib = ctypes.CDLL(_SO)
        except Exception:
            _build_failed = True
            return None
        lib.sgt_read_kitti_bin.restype = ctypes.c_int64
        lib.sgt_read_kitti_bin.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.sgt_read_ply_xyz.restype = ctypes.c_int64
        lib.sgt_read_ply_xyz.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.sgt_loader_create.restype = ctypes.c_void_p
        lib.sgt_loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int64]
        lib.sgt_loader_next.restype = ctypes.c_int64
        lib.sgt_loader_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.sgt_loader_destroy.restype = None
        lib.sgt_loader_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_kitti_bin(path: str, max_points: int = 1 << 21) -> np.ndarray:
    """[N,3] float32 xyz from a KITTI velodyne .bin (native or numpy)."""
    lib = _load()
    if lib is None:
        from small_gicp_tpu.utils import io as pyio

        return pyio.read_kitti_bin(path)
    out = np.empty((max_points, 3), np.float32)
    n = lib.sgt_read_kitti_bin(path.encode(), _fptr(out), max_points)
    if n < 0:
        raise IOError(f"failed to read {path}")
    return out[:n].copy()


def read_ply_xyz(path: str, max_points: int = 1 << 21) -> np.ndarray:
    """[N,3] float32 xyz from a PLY file (native or numpy)."""
    lib = _load()
    if lib is None:
        from small_gicp_tpu.utils import io as pyio

        return pyio.read_ply(path)
    out = np.empty((max_points, 3), np.float32)
    n = lib.sgt_read_ply_xyz(path.encode(), _fptr(out), max_points)
    if n < 0:
        raise IOError(f"failed to read {path}")
    return out[:n].copy()


class DatasetLoader:
    """Prefetching scan iterator (native background thread when
    available, sequential numpy fallback otherwise).

    The host-side half of pipelined odometry: scan i+1 is parsed from
    disk while scan i registers on the TPU (reference analog: the
    flow-graph's preprocessing stages,
    odometry_benchmark_small_gicp_tbb_flow.cpp:56-141).
    """

    def __init__(self, paths: List[str], max_points: int = 1 << 21,
                 prefetch: int = 4):
        self.paths = list(paths)
        self.max_points = max_points
        self.kitti = bool(self.paths) and self.paths[0].endswith(".bin")
        self._lib = _load()
        self._handle = None
        self._i = 0
        if self._lib is not None and self.paths:
            arr = (ctypes.c_char_p * len(self.paths))(
                *[p.encode() for p in self.paths]
            )
            self._paths_keepalive = arr
            self._handle = self._lib.sgt_loader_create(
                arr, len(self.paths), max_points, 1 if self.kitti else 0,
                prefetch,
            )

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        if self._handle is not None:
            out = np.empty((self.max_points, 3), np.float32)
            n = self._lib.sgt_loader_next(self._handle, _fptr(out))
            if n == 0:
                self.close()
                raise StopIteration
            if n < 0:
                raise IOError("scan read failed")
            return out[:n].copy()
        # Fallback: sequential numpy reads.
        if self._i >= len(self.paths):
            raise StopIteration
        p = self.paths[self._i]
        self._i += 1
        return read_kitti_bin(p) if p.endswith(".bin") else read_ply_xyz(p)

    def close(self):
        if self._handle is not None:
            self._lib.sgt_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
