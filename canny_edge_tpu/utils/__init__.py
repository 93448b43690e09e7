from . import timing  # noqa: F401
from .timing import PipelineReport, profile_stages, throughput_chained  # noqa: F401
