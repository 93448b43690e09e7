"""Generate the per-stage documentation figures (reference figures/ parity).

Usage: python docs/make_figures.py [outdir]
Writes input/smoothed/magnitude/nonmax/edges PNGs using the golden pipeline
on the reference test image (or a synthetic fallback).
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from canny_edge_tpu import golden  # noqa: E402
from canny_edge_tpu.io import imageio  # noqa: E402


def main(outdir="docs/figures"):
    os.makedirs(outdir, exist_ok=True)
    ref = "/root/reference/tests/test.jpg"
    if os.path.exists(ref):
        img = imageio.load_grayscale(ref)
    else:
        img = imageio.synthetic_image(256, 256)
    out, inter = golden.canny(img, 1.0, 50, 150, intermediates=True)
    imageio.save_png(f"{outdir}/input.png", img)
    imageio.save_png(f"{outdir}/smoothed.png",
                     imageio.minmax_normalize_u8(inter["smoothed"]))
    imageio.save_png(f"{outdir}/magnitude.png",
                     imageio.minmax_normalize_u8(inter["magnitude"]))
    imageio.save_png(f"{outdir}/nonmax.png",
                     imageio.minmax_normalize_u8(inter["nonmax"]))
    imageio.save_png(f"{outdir}/edges.png", out.astype(np.uint8))
    print(f"wrote 5 figures to {outdir}")


if __name__ == "__main__":
    main(*sys.argv[1:])
