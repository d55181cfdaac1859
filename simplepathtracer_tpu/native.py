"""ctypes loader for the native C++ image encoder (native/libspt_native.so).

The reference leans on stb_image_write (header-only C) for its final BMP
(include/IOHelpers.hpp:6-9); our analog is a from-scratch C++ encoder built
with the repo Makefile.  pybind11 is unavailable in this image, so the ABI
is plain C via ctypes.  Everything degrades gracefully to the pure-Python
encoders in io.py when the .so is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libspt_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH) and os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        try:  # build lazily once; silent failure leaves the Python fallback
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.write_bmp.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.write_bmp.restype = ctypes.c_int
        lib.write_png.argtypes = lib.write_bmp.argtypes
        lib.write_png.restype = ctypes.c_int
        lib.resolve_gamma_u8.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_float,
            ctypes.c_float,
        ]
        lib.resolve_gamma_u8.restype = None
        _LIB = lib
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def _as_u8_ptr(img: np.ndarray):
    img = np.ascontiguousarray(img, np.uint8)
    return img, img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def write_bmp(path: str, img: np.ndarray) -> None:
    lib = _load()
    img, ptr = _as_u8_ptr(img)
    h, w, _ = img.shape
    rc = lib.write_bmp(path.encode(), ptr, w, h)
    if rc != 0:
        raise IOError(f"native write_bmp failed ({rc}) for {path}")


def write_png(path: str, img: np.ndarray) -> None:
    lib = _load()
    img, ptr = _as_u8_ptr(img)
    h, w, _ = img.shape
    rc = lib.write_png(path.encode(), ptr, w, h)
    if rc != 0:
        raise IOError(f"native write_png failed ({rc}) for {path}")


def resolve_gamma_u8(accum: np.ndarray, count: int, gamma: float) -> np.ndarray:
    """Fused host-side resolve: [H,W,3] f32 accum -> gamma u8."""
    lib = _load()
    accum = np.ascontiguousarray(accum, np.float32)
    out = np.empty(accum.shape, np.uint8)
    lib.resolve_gamma_u8(
        accum.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        accum.size,
        1.0 / max(count, 1),
        1.0 / gamma,
    )
    return out
