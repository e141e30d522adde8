"""ctypes bindings for the native CSI batch loader (native/csi_loader.cpp).

Drop-in accelerated replacement for data.csi_io.load_csi_windows: parses .npy
headers in C++, preads each window's tail directly into the left-padded slot
of one preallocated batch buffer across a thread pool. Auto-builds the .so on
first use (g++ is in the image); falls back to the numpy loader when the
toolchain or library is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcsi_loader.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(["bash", os.path.join(_NATIVE_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.csi_load_batch.restype = ctypes.c_int
        lib.csi_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.csi_probe.restype = ctypes.c_int
        lib.csi_probe.argtypes = [ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int64),
                                  ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except OSError:
        _build_failed = True
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def load_csi_windows_native(amp_dir: str, labels: Sequence[str],
                            length: int = 3000,
                            num_threads: int = 8,
                            trailing_shape=(3, 3, 30)) -> np.ndarray:
    """Native equivalent of data.csi_io.load_csi_windows.

    Returns (N, length, *trailing_shape) float32, left-padded. Falls back to
    the numpy implementation when the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        from .csi_io import load_csi_windows
        return load_csi_windows(amp_dir, labels, length, num_threads)

    paths = [os.path.join(amp_dir, f"{label}.npy").encode() for label in labels]
    n = len(paths)
    row_floats = int(np.prod(trailing_shape))
    if n:
        rows = ctypes.c_int64()
        rf = ctypes.c_int64()
        if lib.csi_probe(paths[0], ctypes.byref(rows), ctypes.byref(rf)) == 0:
            row_floats = rf.value
    out = np.zeros((n, length, row_floats), dtype=np.float32)
    arr = (ctypes.c_char_p * n)(*paths)
    failures = lib.csi_load_batch(
        arr, n, length, row_floats,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    if failures:
        raise IOError(f"native loader failed on {failures}/{n} files")
    return out.reshape(n, length, *trailing_shape) \
        if row_floats == int(np.prod(trailing_shape)) else out
