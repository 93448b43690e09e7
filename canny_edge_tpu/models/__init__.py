from .canny import CannyTPU, canny_fn, canny_with_intermediates  # noqa: F401
from .sobel import SobelTPU, sobel_fn, sobel_magnitude_fn  # noqa: F401
