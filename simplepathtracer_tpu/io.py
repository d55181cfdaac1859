"""Framebuffer resolve + image file I/O.

Reference counterpart: include/IOHelpers.hpp — ``WritePixel`` applies
gamma-2.0 (sqrt) and quantizes to u8 into a shared framebuffer (:17-22), and
``SaveImage`` writes ``output{S}s{B}b.bmp`` via stb_image_write (:24-27).

Here the accumulation image stays fp32 on device; gamma + quantize is a
final ``jnp`` pass and files are written host-side.  Encoders: a native C++
encoder (native/image_io.cpp, the stb analog, loaded via ctypes) with a
pure-Python fallback (BMP by hand, PNG via zlib) so the package never needs
a pip install.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np

from . import native


def to_u8(image_float) -> np.ndarray:
    """[H,W,3] float in [0,1] (already gamma-corrected) -> u8.

    Quantization matches io::WritePixel (IOHelpers.hpp:19-21): scale by 255
    and truncate-compatible rounding via clip.
    """
    img = np.asarray(image_float)
    return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)


def write_bmp(path: str, u8_image: np.ndarray) -> None:
    """Write a 24-bit BMP (the reference's output format, IOHelpers.hpp:26)."""
    img = np.asarray(u8_image)
    assert img.ndim == 3 and img.shape[2] == 3 and img.dtype == np.uint8
    if native.available():
        native.write_bmp(path, img)
        return
    h, w, _ = img.shape
    # BMP stores BGR, bottom-up, rows padded to 4 bytes.
    bgr = img[::-1, :, ::-1]
    row_size = (w * 3 + 3) & ~3
    pad = row_size - w * 3
    rows = bgr.tobytes() if pad == 0 else b"".join(
        bgr[y].tobytes() + b"\x00" * pad for y in range(h)
    )
    pixel_bytes = row_size * h
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + pixel_bytes, 0, 0, 54,
        40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0,
    )
    with open(path, "wb") as f:
        f.write(header)
        f.write(rows)


def encode_png(image) -> bytes:
    """Minimal zlib PNG encoder (no external deps) -> PNG byte string.

    Accepts a float image in [0, 1] or a u8 image.  In-memory form serves
    the HTTP live preview (preview.py) without touching disk.
    """
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = to_u8(img)
    assert img.ndim == 3 and img.shape[2] == 3
    h, w, _ = img.shape
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(path: str, u8_image: np.ndarray) -> None:
    """Minimal zlib PNG writer (no external deps)."""
    with open(path, "wb") as f:
        f.write(encode_png(u8_image))


def read_bmp(path: str) -> np.ndarray:
    """Read a 24-bit uncompressed BMP -> [H,W,3] u8 (for round-trip tests
    and for comparing against the reference's images/*.bmp artifacts)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:2] == b"BM"
    offset = struct.unpack_from("<I", data, 10)[0]
    w = struct.unpack_from("<i", data, 18)[0]
    h = struct.unpack_from("<i", data, 22)[0]
    bpp = struct.unpack_from("<H", data, 28)[0]
    assert bpp == 24, f"only 24-bit BMP supported, got {bpp}"
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    img = np.frombuffer(data, np.uint8, row_size * h, offset)
    img = img.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    img = img[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if flip else img


def save_image(path: str, image_float) -> str:
    """Resolve + save by extension (.bmp or .png). Returns the path."""
    u8 = to_u8(image_float)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        write_png(path, u8)
    else:
        write_bmp(path, u8)
    return path


def default_filename(config, prefix: str = "output", ext: str = "bmp") -> str:
    """Deterministic filename keyed by config, generalizing the reference's
    ``output{spp}s{bounces}b.bmp`` scheme (IOHelpers.hpp:26)."""
    return f"{prefix}{config.spp}s{config.max_depth}b_{config.width}x{config.height}.{ext}"
