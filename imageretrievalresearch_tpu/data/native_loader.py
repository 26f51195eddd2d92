"""ctypes binding for the native C++ batch image loader (native/loader.cpp).

``decode_resize_batch(paths, h, w)`` decodes + bilinear-resizes a list of
JPEG/PNG files into one (N, h, w, 3) uint8 array using a persistent C++
thread pool — the hot path the reference runs through PIL in DataLoader
worker processes (train/train.py:76-78). Builds the .so on first use if the
toolchain is present; falls back to PIL otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libirtloader.so")

_lib = None
_lib_lock = threading.Lock()


def _load_lib():
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO_PATH):
            src = os.path.join(_NATIVE_DIR, "loader.cpp")
            if not os.path.exists(src):
                return None
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.irt_decode_resize_batch.restype = ctypes.c_int
            lib.irt_decode_resize_batch.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
            lib.irt_loader_abi_version.restype = ctypes.c_int
            if lib.irt_loader_abi_version() != 1:
                return None
            _lib = lib
        except OSError:
            return None
        return _lib


def native_available() -> bool:
    return _load_lib() is not None


def decode_resize_batch(paths: list[str], h: int, w: int,
                        *, num_threads: int = 0,
                        allow_fallback: bool = True,
                        strict: bool = False) -> np.ndarray:
    """(N, h, w, 3) uint8 from image paths.

    ``strict=True`` raises on any decode failure — the training loader uses
    this so toggling ``--use_native_loader`` cannot turn the PIL path's
    loud IOError into silently training on gray-filled slots. The default
    keeps the lenient fill-gray contract for ad-hoc callers."""
    lib = _load_lib()
    if lib is None:
        if not allow_fallback:
            raise RuntimeError("native loader unavailable")
        return _pil_fallback(paths, h, w, strict=strict)
    n = len(paths)
    out = np.empty((n, h, w, 3), dtype=np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.irt_decode_resize_batch(
        c_paths, n, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), num_threads)
    if strict and failures:
        # the C++ side reports only the count; re-probe cheaply on this
        # (already failing) path so the error names the culprits
        bad = [p for p in paths if not os.path.isfile(p)][:4]
        raise IOError(
            f"native loader: {failures} of {n} images failed to decode"
            + (f" (missing/unreadable: {bad})" if bad
               else " (files exist; corrupt or unsupported format)"))
    return out


def _pil_fallback(paths: list[str], h: int, w: int,
                  *, strict: bool = False) -> np.ndarray:
    from PIL import Image

    out = np.empty((len(paths), h, w, 3), dtype=np.uint8)
    for i, p in enumerate(paths):
        try:
            with Image.open(p) as im:
                im = im.convert("RGB")
                if im.size != (w, h):
                    im = im.resize((w, h), Image.BILINEAR)
                out[i] = np.asarray(im)
        except Exception:
            if strict:
                raise
            out[i] = 128
    return out
