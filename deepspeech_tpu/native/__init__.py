"""Native (C++) components, compiled on demand and loaded via ctypes.

The reference leaned on external native code (python-Levenshtein, ctcdecode,
warp-ctc). Here the native pieces live in-tree, are built with g++ at first
use (cached next to the sources), and every consumer has a pure-Python
fallback so the framework works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_NAME = "libdeepspeech_native.so"
_SOURCES = ["edit_distance.cpp", "beam_search.cpp", "flac_decoder.cpp"]
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build(lib_path: str) -> bool:
    srcs = [os.path.join(_DIR, s) for s in _SOURCES if os.path.exists(os.path.join(_DIR, s))]
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", lib_path, *srcs]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except Exception:
        return False


def load_native():
    """Return the loaded CDLL, building it if needed; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        lib_path = os.path.join(_DIR, _LIB_NAME)
        stale = not os.path.exists(lib_path) or any(
            os.path.exists(os.path.join(_DIR, s))
            and os.path.getmtime(os.path.join(_DIR, s)) > os.path.getmtime(lib_path)
            for s in _SOURCES
        )
        if stale and not _build(lib_path):
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(lib_path)
            lib.edit_distance_u32.restype = ctypes.c_int64
            lib.edit_distance_u32.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
            ]
            lib.flac_probe.restype = ctypes.c_int32
            lib.flac_probe.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64),
            ]
            lib.flac_decode.restype = ctypes.c_int64
            lib.flac_decode.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
            ]
            lib.edit_distance_u32_batch.restype = None
            lib.edit_distance_u32_batch.argtypes = [
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
            ]
            lib.bs_lm_load.restype = ctypes.c_void_p
            lib.bs_lm_load.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.bs_lm_free.restype = None
            lib.bs_lm_free.argtypes = [ctypes.c_void_p]
            lib.bs_lm_order.restype = ctypes.c_int32
            lib.bs_lm_order.argtypes = [ctypes.c_void_p]
            lib.bs_lm_score_word.restype = ctypes.c_double
            lib.bs_lm_score_word.argtypes = [
                ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ]
            lib.bs_decode.restype = ctypes.c_int32
            lib.bs_decode.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_void_p, ctypes.c_double,
                ctypes.c_double, ctypes.c_char_p, ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib
