from .cache import KVCache, init_cache  # noqa: F401
from .sampling import sample_top_k_top_p, greedy  # noqa: F401
from .engine import Engine  # noqa: F401
