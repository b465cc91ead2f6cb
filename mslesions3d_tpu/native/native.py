"""ctypes bindings for the native NIfTI loader (auto-built on first use).

Build is a single g++ invocation (no cmake/pybind11); the .so is cached next
to the source. Falls back cleanly if no compiler is available —
data/nifti.py stays the pure-Python reference implementation.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libmsl_native.so"
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def build(force: bool = False) -> bool:
    """Compile the native library; returns True on success.

    A cached .so older than the source is rebuilt (stale binaries would
    silently miss newer entry points like msl_nifti_shape4).
    """
    src = _DIR / "nifti_loader.cc"
    if _SO.exists() and not force and _SO.stat().st_mtime >= src.stat().st_mtime:
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", str(src), "-lz", "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not build():
            return None
        lib = ctypes.CDLL(str(_SO))
        lib.msl_nifti_shape.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.msl_nifti_shape.restype = ctypes.c_int
        lib.msl_nifti_shape4.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.msl_nifti_shape4.restype = ctypes.c_int
        lib.msl_nifti_load.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
        ]
        lib.msl_nifti_load.restype = ctypes.c_int
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def load_nifti_fast(path, normalize: bool = False):
    """Load a 3D/4D NIfTI volume as fp32 C-order array via the native decoder.

    4-D (multi-contrast) volumes come back channels-last (D, H, W, C); plain
    3-D volumes stay 3-D. normalize=True applies nonzero-mean/std
    normalization in native code, per channel for 4-D (MONAI
    NormalizeIntensityd(nonzero=True) parity per independently-scaled
    acquisition). Returns (data, pixdim) or raises RuntimeError on failure.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native loader unavailable (no compiler?)")

    path_b = str(path).encode()
    shape = (ctypes.c_int * 4)()
    pixdim = (ctypes.c_float * 3)()
    rc = lib.msl_nifti_shape4(path_b, shape, pixdim)
    if rc != 0:
        raise RuntimeError(f"msl_nifti_shape4 failed with code {rc} for {path}")

    dims = (shape[0], shape[1], shape[2]) if shape[3] == 1 else tuple(shape)
    out = np.empty(dims, dtype=np.float32)
    rc = lib.msl_nifti_load(
        path_b,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,
        1 if normalize else 0,
    )
    if rc != 0:
        raise RuntimeError(f"msl_nifti_load failed with code {rc} for {path}")
    return out, tuple(float(p) or 1.0 for p in pixdim)
