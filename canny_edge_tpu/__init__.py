"""canny_edge_tpu — a TPU-native Canny edge-detection framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
StevenChang5/Canny_Edge C++/CUDA reference: the full four-stage Canny
pipeline (sigma-parameterized separable Gaussian blur with border
renormalization, fused Sobel gradient + magnitude/direction, direction-
quantized non-max suppression, hysteresis thresholding as a data-parallel
fixed point), bit-exact against the reference CPU semantics, scaling from a
single chip to multi-host pod slices via 2-D spatial partitioning with ICI
halo exchange.
"""

__version__ = "0.1.0"

from . import golden  # noqa: F401
