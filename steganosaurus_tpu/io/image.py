"""Image load/save (replaces vendored stb_image / stb_image_write).

The reference force-loads 3 channels (`stbi_load(..., 3)`, steganosaur.cpp:909)
— RGBA drops alpha, grayscale replicates — and writes 8-bit RGB PNG
(stbi_write_png, :1104). PIL reproduces both: `convert("RGB")` drops alpha
without compositing and replicates luma; PNG round-trips losslessly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from PIL import Image


def load_rgb(path: str) -> np.ndarray:
    """Load any PIL-supported image as (H, W, 3) uint8."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def encode_png(rgb: np.ndarray) -> bytes:
    """Lossless 8-bit RGB PNG encoder tuned for serving latency.

    PIL's encoder spends ~2.7 s on a 4K stego (per-row adaptive filter
    search + zlib level 6); that was the single largest term in the warm
    `serve` embed p50. This path uses the libpng "fast" recipe — fixed
    Up filter (vectorized as one row-difference) + zlib level 1 with
    Z_RLE strategy — measured ~5x faster at equal-or-smaller output on
    gradient, photo-like, and noise covers (doc/PAPER.md §5b). Output is
    a standard single-IDAT PNG every decoder reads; round-trip equality
    is asserted in tests/test_image_io.py::test_fast_png_lossless.
    """
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    h, w, _ = rgb.shape
    flat = rgb.reshape(h, w * 3)
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 2  # PNG filter type 2 ("Up"); u8 wraparound == PNG spec
    raw[0, 1:] = flat[0]
    np.subtract(flat[1:], flat[:-1], out=raw[1:, 1:])
    comp = zlib.compressobj(1, zlib.DEFLATED, 15, 8, zlib.Z_RLE)
    idat = comp.compress(raw.tobytes()) + comp.flush()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    return (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def save_png(path: str, rgb: np.ndarray) -> None:
    """Write (H, W, 3) uint8 as a lossless RGB PNG (fast encoder)."""
    data = encode_png(rgb)
    with open(path, "wb") as f:
        f.write(data)
