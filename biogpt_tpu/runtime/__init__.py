from .cache import KVCache, init_cache  # noqa: F401
from .health import (DrainStallError, ModelHealthError,  # noqa: F401
                     check_params_finite)
from .metrics import ServingMetrics  # noqa: F401
from .sampling import sample_top_k_top_p, greedy  # noqa: F401


def __getattr__(name):
    # Engine imports models.biogpt (which imports runtime.cache); resolve it
    # lazily to keep `from biogpt_tpu.runtime import Engine` working without
    # a circular import at package-init time.
    if name == "Engine":
        from .engine import Engine
        return Engine
    raise AttributeError(name)
