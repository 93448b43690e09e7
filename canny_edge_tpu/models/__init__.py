from .canny import CannyTPU, canny_fn, canny_with_intermediates  # noqa: F401
