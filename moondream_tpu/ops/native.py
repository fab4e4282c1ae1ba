"""ctypes loader for the native host-preprocessing library.

`native/preprocess.cpp` is the in-repo native equivalent of the reference's
optional pyvips/libvips fast path (reference image_crops.py:124-136): a
multithreaded, bit-exact reimplementation of PIL's fixed-point LANCZOS
resampler plus the whole overlap-crop pipeline in one C call.

Loading policy: use the prebuilt .so next to the sources; if missing and a
compiler is available, build it once (best effort); otherwise callers fall
back to PIL. `MOONDREAM_NO_NATIVE=1` disables the native path entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmdpreprocess.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Returns the native library, or None when unavailable/disabled."""
    global _lib, _tried
    if os.environ.get("MOONDREAM_NO_NATIVE"):
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.md_resize_lanczos.restype = ctypes.c_int
            lib.md_resize_lanczos.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ]
            lib.md_overlap_crops.restype = ctypes.c_int
            lib.md_overlap_crops.argtypes = [
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int,
            ]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return load() is not None


def resize_lanczos(
    image: np.ndarray, out_h: int, out_w: int, n_threads: int = 0
) -> Optional[np.ndarray]:
    """Bit-exact PIL LANCZOS resize via the native library. Returns None
    when the library is unavailable (caller falls back to PIL)."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.uint8)
    h, w = src.shape[:2]
    ch = src.shape[2] if src.ndim == 3 else 1
    dst = np.empty(
        (out_h, out_w, ch) if src.ndim == 3 else (out_h, out_w), np.uint8
    )
    rc = lib.md_resize_lanczos(
        src.ctypes.data, h, w, ch, dst.ctypes.data, out_h, out_w, n_threads
    )
    return dst if rc == 0 else None


def overlap_crops(
    image: np.ndarray,
    base: int,
    margin_px: int,
    tiling: Tuple[int, int],
    n_threads: int = 0,
) -> Optional[np.ndarray]:
    """Full overlap-crop pipeline in one native call. Returns the
    (rows*cols + 1, base, base, ch) uint8 crop stack, or None when the
    library is unavailable."""
    lib = load()
    if lib is None:
        return None
    src = np.ascontiguousarray(image, dtype=np.uint8)
    h, w, ch = src.shape
    rows, cols = tiling
    out = np.zeros((rows * cols + 1, base, base, ch), np.uint8)
    rc = lib.md_overlap_crops(
        src.ctypes.data, h, w, ch, out.ctypes.data,
        base, margin_px, rows, cols, n_threads,
    )
    return out if rc == 0 else None
