"""Image loading for the 2D image-fitting mode.

Mirrors ``Testbed::load_image`` (``src/testbed_image.cu:371-438``): EXR
(float, linear colors), LDR via PIL (sRGB→linear, like the reference's stbi
path), and the raw ``.bin`` gigapixel format (int32 height, int32 width,
then half RGBA — produced by ``scripts/convert_image.py``).
"""

from __future__ import annotations

import struct

import numpy as np

from ngp_tpu.data.exr import read_exr


def srgb_to_linear_np(x: np.ndarray) -> np.ndarray:
    return np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def load_image(path: str) -> np.ndarray:
    """Returns (H, W, 4) float32 in *linear* color (alpha=1 where missing)."""
    p = path.lower()
    if p.endswith(".exr"):
        img = read_exr(path)
    elif p.endswith(".bin"):
        img = load_binary_image(path)
    else:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGBA"), np.float32) / 255.0
        img = arr.copy()
        img[..., :3] = srgb_to_linear_np(arr[..., :3])
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    elif img.shape[-1] < 3:
        img = np.concatenate(
            [np.repeat(img[..., :1], 3, axis=-1), np.ones_like(img[..., :1])], -1
        )
    return img.astype(np.float32)


def load_binary_image(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        h, w = struct.unpack("<ii", f.read(8))
        data = np.frombuffer(f.read(h * w * 4 * 2), np.float16)
    return data.reshape(h, w, 4).astype(np.float32)


def save_binary_image(path: str, img: np.ndarray) -> None:
    h, w = img.shape[:2]
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", h, w))
        f.write(img.astype(np.float16).tobytes())
