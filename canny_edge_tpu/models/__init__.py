from .canny import (CannyTPU, canny_fn, canny_fn_batched,  # noqa: F401
                    canny_with_intermediates)
from .sobel import SobelTPU, sobel_fn, sobel_magnitude_fn  # noqa: F401
