from . import frontend, fused, hysteresis  # noqa: F401
from .frontend import frontend_nm  # noqa: F401
from .fused import canny_fused  # noqa: F401
from .hysteresis import hysteresis_pallas  # noqa: F401
from .hysteresis_packed import hysteresis_packed_pallas  # noqa: F401
