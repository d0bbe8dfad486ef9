from sparch_tpu.ops.surrogate import boxcar_window, spike_boxcar  # noqa: F401
from sparch_tpu.ops import cells  # noqa: F401
