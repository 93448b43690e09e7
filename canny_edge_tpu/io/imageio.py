"""Image IO with reference-parity semantics.

The reference loads test images with OpenCV ``imread(..., IMREAD_GRAYSCALE)``
(tests/utils/test_utils.cpp:48-49) and converts camera frames with
``cvtColor(..., COLOR_BGR2GRAY)`` (src/main.cpp:113).  This module provides
the same conversions (including OpenCV's exact fixed-point BGR->gray
rounding) plus the min-max normalization used by the reference's ``-s``
stage display (src/utils.cpp:440-486).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this environment
    cv2 = None


def load_grayscale(path: str) -> np.ndarray:
    """uint8 (H, W) grayscale, loaded exactly as the reference loads it."""
    if cv2 is not None:
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            raise FileNotFoundError(f"cannot read image: {path}")
        return img.astype(np.uint8)
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.uint8)


def bgr_to_gray(bgr: np.ndarray) -> np.ndarray:
    """OpenCV COLOR_BGR2GRAY with its exact fixed-point rounding.

    y = (9798*R + 19235*G + 3735*B + 2^14) >> 15  (ITU-R BT.601 weights in
    Q15), verified bit-exact against cv2.cvtColor on uint8 inputs
    (src/main.cpp:113 parity).
    """
    b = bgr[..., 0].astype(np.int32)
    g = bgr[..., 1].astype(np.int32)
    r = bgr[..., 2].astype(np.int32)
    y = (9798 * r + 19235 * g + 3735 * b + (1 << 14)) >> 15
    return y.astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    # an extension-less path gives an opaque encoder error deep inside
    # cv2/PIL — default to .png instead (the format this writer is for)
    if not os.path.splitext(path)[1]:
        path = path + ".png"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.asarray(img)
    if arr.dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8)
    if cv2 is not None:
        cv2.imwrite(path, arr)
    else:
        from PIL import Image

        Image.fromarray(arr).save(path)


def minmax_normalize_u8(img: np.ndarray) -> np.ndarray:
    """Min-max normalize to [0, 255] uint8 like the reference's ``-s`` view.

    Mirrors ``normalize(src, dst, 0, 255, NORM_MINMAX)`` +
    ``convertTo(CV_8U)`` (src/utils.cpp:444-445): linear map of [min, max]
    to [0, 255] with round-half-to-even, constant images map to 0.
    """
    a = img.astype(np.float64)
    lo, hi = a.min(), a.max()
    if hi == lo:
        return np.zeros(img.shape, np.uint8)
    scaled = (a - lo) * (255.0 / (hi - lo))
    return np.rint(scaled).astype(np.uint8)


def synthetic_image(h: int, w: int, seed: int = 0) -> np.ndarray:
    """Deterministic structured test frame (gradients + disc + stripes)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = 96 + 64 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    img += 80 * (((xx - w / 2) ** 2 + (yy - h / 2) ** 2) < (min(h, w) / 3) ** 2)
    img += 40 * ((xx + yy) % 97 < 31)
    img += rng.normal(0, 6, size=(h, w))
    return np.clip(img, 0, 255).astype(np.uint8)
