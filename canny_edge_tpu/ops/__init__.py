from . import numerics, shifts, stages  # noqa: F401
from .numerics import exact_div_f32, isqrt_int32, quantize_angle_int  # noqa: F401
from .stages import (  # noqa: F401
    gaussian_blur,
    hysteresis,
    nonmax_suppression,
    sobel,
    xy_gradient,
)
