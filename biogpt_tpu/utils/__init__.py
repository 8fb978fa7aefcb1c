from .profiling import Timer, trace, device_memory_stats  # noqa: F401
from .logging import get_logger, set_verbosity  # noqa: F401
