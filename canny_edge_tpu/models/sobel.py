"""Sobel edge detector: a second model family sharing the stage library.

The reference ships only the full Canny app, but its Sobel stage is usable
standalone (threshold on gradient magnitude).  This model demonstrates the
framework's composability: blur + fused Sobel from ops.stages, jitted, with
the same validation and batching surface as CannyTPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.reference import gaussian_kernel
from ..ops import stages


def sobel_fn(img, threshold, *, kernel_vals):
    """uint8 (..., H, W) -> int16 {0,255}: blur + gradient magnitude
    thresholding (no NMS/hysteresis)."""
    smoothed = stages._gaussian_blur_with_kernel(img, kernel_vals)
    mag, _ = stages.sobel(smoothed)
    return jnp.where(mag >= threshold, jnp.int16(255), jnp.int16(0))


def sobel_magnitude_fn(img, *, kernel_vals):
    """uint8 -> int16 gradient magnitude (the reference's 'Edge Image'
    display, src/utils.cpp:454-462)."""
    smoothed = stages._gaussian_blur_with_kernel(img, kernel_vals)
    mag, _ = stages.sobel(smoothed)
    return mag.astype(jnp.int16)


@dataclass
class SobelTPU:
    """Blur + Sobel magnitude edge model.

    Example::

        model = SobelTPU(sigma=1.0)
        edges = model(img_u8, threshold=80)
        mag = model.magnitude(img_u8)
    """

    sigma: float = 1.0
    kernel: np.ndarray = field(init=False)

    def __post_init__(self):
        self.kernel = gaussian_kernel(self.sigma)
        kv = tuple(float(v) for v in self.kernel)
        self._fn = jax.jit(functools.partial(sobel_fn, kernel_vals=kv))
        self._mag = jax.jit(functools.partial(sobel_magnitude_fn,
                                              kernel_vals=kv))
        self._batched = jax.jit(jax.vmap(
            functools.partial(sobel_fn, kernel_vals=kv), in_axes=(0, None)))

    def __call__(self, img, threshold: int):
        if not (0 <= threshold <= 1443):
            raise ValueError("threshold must be in [0, 1443]")
        return self._fn(img, jnp.int32(threshold))

    def batch(self, imgs, threshold: int):
        return self._batched(imgs, jnp.int32(threshold))

    def magnitude(self, img):
        return self._mag(img)
