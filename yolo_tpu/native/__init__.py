"""Native (C++/OpenMP) host pipeline acceleration with pure-Python fallback.

Builds native/fastpre.cpp on first import (g++, cached .so) and exposes:
  - letterbox_batch: whole-batch letterbox into one NHWC uint8 buffer
  - normalize_batch: uint8 -> f32 (/256, optional maxabs) on host threads
``available()`` reports whether the native path is usable; callers fall back
to the numpy/cv2 implementations in data/transforms.py otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _build_and_load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    src = os.path.join(root, 'native', 'fastpre.cpp')
    so = os.path.join(root, 'native', 'libfastpre.so')
    try:
        if (not os.path.exists(so) or
                os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ['g++', '-O3', '-fopenmp', '-shared', '-fPIC', src, '-o', so],
                check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.letterbox_batch.argtypes = [
            ctypes.POINTER(ctypes.c_void_p),
            np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
            ctypes.c_int32, ctypes.c_int32,
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.float32),
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ]
        lib.normalize_batch.argtypes = [
            np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS'),
            np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS'),
            ctypes.c_int64, ctypes.c_int32,
        ]
        lib.fastpre_num_threads.restype = ctypes.c_int32
        _LIB = lib
    except (OSError, subprocess.CalledProcessError):
        _LIB = None
    return _LIB


def available() -> bool:
    return _build_and_load() is not None


def num_threads() -> int:
    lib = _build_and_load()
    return int(lib.fastpre_num_threads()) if lib else 0


def letterbox_batch(images: list[np.ndarray], dst_h: int, dst_w: int,
                    pad_value: int = 114, scaleup: bool = True,
                    bgr2rgb: bool = True):
    """Batch letterbox: list of HWC uint8 (BGR) -> ((n, dst_h, dst_w, c) RGB
    uint8, ratios (n,), pads (n, 2)). Raises if the native lib is missing."""
    lib = _build_and_load()
    assert lib is not None, 'native fastpre unavailable'
    n = len(images)
    c = images[0].shape[2]
    images = [np.ascontiguousarray(im) for im in images]
    src_ptrs = (ctypes.c_void_p * n)(
        *[im.ctypes.data_as(ctypes.c_void_p).value for im in images])
    src_h = np.array([im.shape[0] for im in images], np.int32)
    src_w = np.array([im.shape[1] for im in images], np.int32)
    dst = np.empty((n, dst_h, dst_w, c), np.uint8)
    ratios = np.empty(n, np.float32)
    pads = np.empty((n, 2), np.float32)
    lib.letterbox_batch(src_ptrs, src_h, src_w, n, c, dst, dst_h, dst_w,
                        ratios, pads, pad_value, int(scaleup), int(bgr2rgb))
    return dst, ratios, pads


def normalize_batch(batch_u8: np.ndarray, maxabs: bool = False) -> np.ndarray:
    lib = _build_and_load()
    assert lib is not None, 'native fastpre unavailable'
    batch_u8 = np.ascontiguousarray(batch_u8)
    out = np.empty(batch_u8.shape, np.float32)
    lib.normalize_batch(batch_u8.reshape(-1), out.reshape(-1),
                        batch_u8.size, int(maxabs))
    return out
