"""Lazy g++ build + ctypes loader for the native components."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(__file__)
_SRCS = [os.path.join(_DIR, "contours.cpp"), os.path.join(_DIR, "haar.cpp")]
_SO = os.path.join(_DIR, "libtpuimage_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    try:
        if (os.path.exists(_SO)
                and all(os.path.getmtime(_SO) >= os.path.getmtime(s)
                        for s in _SRCS)):
            return True
        # NO -ffast-math: the haar evaluator's bit-parity contract needs
        # plain IEEE double ops; -ffp-contract=off forbids FMA contraction
        # even with wider ISAs. -mavx2 (guarded by a cpuinfo check) enables
        # the 4-lane window path in haar.cpp — per-lane IEEE semantics are
        # identical to scalar.
        flags = ["-O3", "-shared", "-fPIC", "-std=c++17",
                 "-ffp-contract=off"]
        try:
            with open("/proc/cpuinfo") as f:
                if " avx2 " in f.read().replace("\n", " "):
                    flags.append("-mavx2")
        except OSError:
            pass
        r = subprocess.run(["g++", *flags, *_SRCS, "-o", _SO],
                           capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """Return the loaded library, building it if needed; None on failure
    (consumers fall back to pure Python)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _build():
            _failed = True
            return None
        try:
            lib = ctypes.CDLL(_SO)
            fn = lib.tpuimage_trace_contours
            fn.restype = ctypes.c_int64
            fn.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ]
            dr = lib.tpuimage_draw_segments
            dr.restype = None
            dr.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_double,
            ]
            hl = lib.tpuimage_haar_level
            hl.restype = ctypes.c_int64
            hl.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
            ]
            _lib = lib
        except Exception:
            _failed = True
    return _lib
