#!/usr/bin/env python3
"""Convert an image to the raw fp16 ``.bin`` gigapixel format (or between
formats) — reference ``scripts/convert_image.py``. The ``.bin`` layout is
the reference's (int32 w, int32 h, then half RGBA rows,
``testbed_image.cu:420-438``)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ngp_tpu.data.image_loader import load_image, save_binary_image


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default="", help="defaults to <input>.bin")
    args = ap.parse_args()

    import PIL.Image

    PIL.Image.MAX_IMAGE_PIXELS = 10_000_000_000
    img = load_image(args.input)  # (H, W, 4) float32 linear
    print(f"{img.shape[1]}x{img.shape[0]} pixels, {img.shape[2]} channels")
    out = args.output or os.path.splitext(args.input)[0] + ".bin"
    if out.endswith(".bin"):
        save_binary_image(out, img.astype(np.float16))
    elif out.endswith(".exr"):
        from ngp_tpu.data.exr import write_exr

        write_exr(out, img)
    else:
        from ngp_tpu.ops.tonemap import linear_to_srgb

        u8 = np.clip(np.asarray(linear_to_srgb(img[..., :3])) * 255, 0, 255)
        PIL.Image.fromarray(u8.astype(np.uint8)).save(out)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
