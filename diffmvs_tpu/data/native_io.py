"""ctypes bindings for the native JPEG decode+resize library.

The tpu-native equivalent of the reference's C++ DataLoader workers
(/root/reference/train.py:359-362): a GIL-free std::thread pool decodes
JPEGs and resamples them (Pillow-BILINEAR bit-parity, see
native/jpeg_loader.cpp) straight into numpy buffers — no PIL object
churn, no multiprocessing pickling. Falls back silently to the PIL path
when the library can't be built (set DIFFMVS_NATIVE_IO=0 to force the
fallback).

The .so is built lazily from native/jpeg_loader.cpp on first use (one
`make -C native`, ~1 s) and cached; tests/test_native_io.py asserts
bit-equality vs PIL decode+resize.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_SO = os.path.join(_NATIVE_DIR, "libdiffmvs_io.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("DIFFMVS_NATIVE_IO", "1") == "0":
            return None
        try:
            src = os.path.join(_NATIVE_DIR, "jpeg_loader.cpp")
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(src)):
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.djpeg_dims.restype = ctypes.c_int
            lib.djpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.djpeg_decode_resize.restype = ctypes.c_int
            lib.djpeg_decode_resize.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
                ctypes.c_int, ctypes.c_void_p]
            lib.djpeg_decode_resize_batch.restype = ctypes.c_int
            lib.djpeg_decode_resize_batch.argtypes = [
                ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
                ctypes.POINTER(ctypes.c_size_t),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def jpeg_dims(data: bytes) -> Optional[Tuple[int, int]]:
    """(width, height) from the JPEG header, or None on failure."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.djpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h)):
        return None
    return w.value, h.value


def decode_resize(data: bytes, size_wh: Tuple[int, int]
                  ) -> Optional[np.ndarray]:
    """Decode a JPEG and Pillow-BILINEAR-resize to (W, H); returns
    [H, W, 3] uint8 or None on failure (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    w, h = int(size_wh[0]), int(size_wh[1])
    out = np.empty((h, w, 3), np.uint8)
    if lib.djpeg_decode_resize(data, len(data), w, h,
                               out.ctypes.data_as(ctypes.c_void_p)):
        return None
    return out


def decode_resize_batch(datas: Sequence[bytes],
                        sizes_wh: Sequence[Tuple[int, int]],
                        nthreads: int = 0) -> Optional[List[np.ndarray]]:
    """Threaded batch decode+resize (GIL released for the whole batch).
    nthreads=0 -> one thread per image, capped at os.cpu_count()."""
    lib = _load()
    if lib is None:
        return None
    n = len(datas)
    if n == 0:
        return []
    if nthreads <= 0:
        nthreads = min(n, os.cpu_count() or 1)
    outs = [np.empty((int(hh), int(ww), 3), np.uint8)
            for ww, hh in sizes_wh]
    arr_d = (ctypes.c_char_p * n)(*datas)
    arr_l = (ctypes.c_size_t * n)(*[len(d) for d in datas])
    arr_w = (ctypes.c_int * n)(*[int(s[0]) for s in sizes_wh])
    arr_h = (ctypes.c_int * n)(*[int(s[1]) for s in sizes_wh])
    arr_o = (ctypes.c_void_p * n)(
        *[o.ctypes.data_as(ctypes.c_void_p).value for o in outs])
    if lib.djpeg_decode_resize_batch(n, arr_d, arr_l, arr_w, arr_h,
                                     arr_o, nthreads):
        return None
    return outs
