"""Quickstart: load a scene dict, render, write a PNG.

The API mirrors the reference's python quickstart
(docs/tutorials/getting_started/quickstart.ipynb): `load_dict` /
`load_file` build a Scene, `render` returns a [H, W, 3] linear image.
Run on CPU with:  python examples/01_render_cornell.py
(on a TPU host the default backend is used automatically).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import mitsuba3_tpu as mi


def main():
    scene = mi.load_dict(mi.cornell_box(width=256, height=256,
                                        max_depth=6))
    img = np.asarray(mi.render(scene, spp=64, seed=0))
    print("mean RGB:", img.mean(axis=(0, 1)))

    # sRGB encode + save (PIL ships in the image)
    srgb = np.where(img <= 0.0031308, img * 12.92,
                    1.055 * np.maximum(img, 1e-8) ** (1 / 2.4) - 0.055)
    from PIL import Image
    Image.fromarray((np.clip(srgb, 0, 1) * 255).astype(np.uint8)).save(
        "cornell.png")
    print("wrote cornell.png")


if __name__ == "__main__":
    main()
