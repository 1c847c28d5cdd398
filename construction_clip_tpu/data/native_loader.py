"""ctypes binding for the native C++ image ingest (native/image_loader.cpp).

load_image_native(path, size) decodes a JPEG with libjpeg DCT-domain prescaling,
box-downscales the short side to `size` and center-crops — the fused C version of
pipeline.host_shape_unify(default_load_image(path), size). Falls back to the
PIL+numpy path for non-JPEGs or when the shared library is unavailable.

The library auto-builds on first use (g++ is baked into this image); set
CCTPU_NO_NATIVE=1 to force the Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libcctpu_image.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _load_library():
    global _lib, _build_failed
    if _lib is not None or _build_failed or os.environ.get("CCTPU_NO_NATIVE"):
        return _lib
    with _lib_lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
            lib.cctpu_decode_resize_crop.restype = ctypes.c_int
            lib.cctpu_decode_resize_crop.argtypes = [
                ctypes.c_char_p, ctypes.c_long, ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint8)]
            lib.cctpu_jpeg_dims.restype = ctypes.c_int
            lib.cctpu_jpeg_dims.argtypes = [
                ctypes.c_char_p, ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            _lib = lib
        except OSError:
            _build_failed = True
    return _lib


def native_available() -> bool:
    return _load_library() is not None


def load_image_native(path: str, size: int) -> np.ndarray:
    """-> [size, size, 3] uint8. JPEG fast path in C; PIL fallback otherwise."""
    lib = _load_library()
    if lib is not None and path.lower().endswith((".jpg", ".jpeg", ".jpe")):
        with open(path, "rb") as f:
            data = f.read()
        out = np.empty((size, size, 3), dtype=np.uint8)
        rc = lib.cctpu_decode_resize_crop(
            data, len(data), size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if rc == 0:
            return out
        # fall through to PIL on decode errors
    from construction_clip_tpu.data.pipeline import default_load_image, host_shape_unify

    return host_shape_unify(default_load_image(path), size)


def make_native_loader(size: int):
    """load_image hook for ImageTextLoader: images arrive already staged at `size`,
    so host_shape_unify becomes a no-op."""
    return lambda path: load_image_native(path, size)
