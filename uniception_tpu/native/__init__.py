"""
Native (C++) host-side components, loaded via ctypes.

Compiled lazily with g++ on first use and cached next to the source; if no
compiler is available the callers fall back to numpy, so the native layer
is an accelerator, never a dependency.
"""

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "_preprocess.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _LIB, _SRC]
    subprocess.run(cmd, check=True, capture_output=True)


def load_preprocess():
    "Return the ctypes lib with typed signatures, or None if unavailable."
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
                _build()
            lib = ctypes.CDLL(_LIB)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i64 = ctypes.c_int64
            lib.normalize_u8_hwc_to_f32_chw.argtypes = [u8p, f32p, i64, i64, i64, f32p, f32p]
            lib.normalize_u8_hwc_to_f32_chw.restype = None
            lib.normalize_f32_hwc_to_f32_chw.argtypes = [f32p, f32p, i64, i64, i64, f32p, f32p]
            lib.normalize_f32_hwc_to_f32_chw.restype = None
            _lib = lib
        except Exception:  # noqa: BLE001 - no compiler / unsupported platform
            _lib = None
        return _lib
