"""Image load/save (replaces vendored stb_image / stb_image_write).

The reference force-loads 3 channels (`stbi_load(..., 3)`, steganosaur.cpp:909)
— RGBA drops alpha, grayscale replicates — and writes 8-bit RGB PNG
(stbi_write_png, :1104). PIL reproduces both: `convert("RGB")` drops alpha
without compositing and replicates luma; PNG round-trips losslessly.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_rgb(path: str) -> np.ndarray:
    """Load any PIL-supported image as (H, W, 3) uint8."""
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def save_png(path: str, rgb: np.ndarray) -> None:
    """Write (H, W, 3) uint8 as a lossless RGB PNG."""
    assert rgb.dtype == np.uint8 and rgb.ndim == 3 and rgb.shape[2] == 3
    Image.fromarray(rgb, mode="RGB").save(path, format="PNG")
