"""ctypes binding for the native prefetching image loader.

The C++ library (native/loader/) decodes PNG/PGM/PPM to grayscale float32
in worker threads with an ordered look-ahead queue, replacing the
reference's synchronous cv::imread on the tracking thread
(mono_tum.cc:75-86). Build with `make -C native`; falls back to the pure-
Python readers in io/datasets.py when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "build",
    "libmyslam_native.so")

_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.myslam_loader_open.restype = ctypes.c_void_p
    lib.myslam_loader_open.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int]
    lib.myslam_loader_next.restype = ctypes.c_int
    lib.myslam_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.myslam_loader_copy.restype = ctypes.c_int
    lib.myslam_loader_copy.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
    lib.myslam_loader_close.argtypes = [ctypes.c_void_p]
    lib.myslam_loader_size.restype = ctypes.c_long
    lib.myslam_loader_size.argtypes = [ctypes.c_void_p]
    lib.myslam_decode_file.restype = ctypes.c_int
    lib.myslam_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


def decode_file(path: str, max_pixels: int = 4096 * 4096
                ) -> Optional[np.ndarray]:
    """Decode one image natively -> [H, W] float32, or None."""
    lib = _load_lib()
    if lib is None:
        return None
    buf = np.empty(max_pixels, np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    ok = lib.myslam_decode_file(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_pixels, ctypes.byref(w), ctypes.byref(h))
    if not ok:
        return None
    return buf[: w.value * h.value].reshape(h.value, w.value).copy()


class PrefetchLoader:
    """Ordered prefetching iterator over an image path list."""

    def __init__(self, paths: List[str], n_workers: int = 4,
                 ahead: int = 8, max_pixels: int = 4096 * 4096):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader not built — run `make -C native`")
        self._lib = lib
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        self._handle = ctypes.c_void_p(lib.myslam_loader_open(
            arr, len(paths), n_workers, ahead))
        self._max_pixels = max_pixels

    def __iter__(self):
        return self

    def __next__(self):
        idx = ctypes.c_int()
        w = ctypes.c_int()
        h = ctypes.c_int()
        ok = self._lib.myslam_loader_next(
            self._handle, ctypes.byref(idx), ctypes.byref(w),
            ctypes.byref(h))
        if not ok:
            raise StopIteration
        buf = np.empty(self._max_pixels, np.float32)
        n = self._lib.myslam_loader_copy(
            self._handle,
            buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._max_pixels)
        img = buf[:n].reshape(h.value, w.value).copy()
        return idx.value, img

    def close(self):
        if self._handle:
            self._lib.myslam_loader_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
