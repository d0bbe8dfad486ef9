from sparch_tpu.utils.profiling import trace  # noqa: F401
from sparch_tpu.utils.timing import time_fn  # noqa: F401
