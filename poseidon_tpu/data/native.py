"""ctypes bindings for the native collate library (native/fast_collate.cc).

Loads ``libfast_collate.so`` if built (``make -C native``); every entry point
has a numpy fallback so the package works without the native build. The
loader uses :func:`collate_normalize` for the batch-assembly hot path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    for cand in (os.path.join(here, "native", "libfast_collate.so"),
                 "libfast_collate.so"):
        try:
            lib = ctypes.CDLL(cand)
            lib.collate_normalize.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p]
            lib.collate_stack.argtypes = [
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int64]
            _LIB = lib
            break
        except OSError:
            continue
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr_array(samples):
    arr = (ctypes.c_void_p * len(samples))()
    for i, s in enumerate(samples):
        arr[i] = s.ctypes.data_as(ctypes.c_void_p).value
    return arr


def collate_normalize(samples, mean: Optional[np.ndarray] = None,
                      std: Optional[np.ndarray] = None) -> np.ndarray:
    """Stack N (C, H, W) float32 samples into a normalized (N, C, H, W) batch."""
    samples = [np.ascontiguousarray(s, np.float32) for s in samples]
    n = len(samples)
    c, h, w = samples[0].shape
    out = np.empty((n, c, h, w), np.float32)
    lib = _load()
    if lib is not None:
        m = (np.ascontiguousarray(mean, np.float32).ravel()
             if mean is not None else None)
        s = (np.ascontiguousarray(std, np.float32).ravel()
             if std is not None else None)
        lib.collate_normalize(
            _ptr_array(samples), out.ctypes.data_as(ctypes.c_void_p),
            n, c, h * w,
            m.ctypes.data_as(ctypes.c_void_p) if m is not None else None,
            s.ctypes.data_as(ctypes.c_void_p) if s is not None else None)
        return out
    # numpy fallback
    out[:] = np.stack(samples)
    if mean is not None:
        out -= np.asarray(mean, np.float32).reshape(1, -1, 1, 1)
    if std is not None:
        out /= np.asarray(std, np.float32).reshape(1, -1, 1, 1)
    return out


def collate_stack(samples) -> np.ndarray:
    """Parallel stack of N equal-shape float32 arrays."""
    samples = [np.ascontiguousarray(s, np.float32) for s in samples]
    n = len(samples)
    out = np.empty((n,) + samples[0].shape, np.float32)
    lib = _load()
    if lib is not None:
        lib.collate_stack(_ptr_array(samples),
                          out.ctypes.data_as(ctypes.c_void_p),
                          n, int(np.prod(samples[0].shape)))
        return out
    out[:] = np.stack(samples)
    return out
