from sparch_tpu.serve.predictor import Predictor  # noqa: F401
from sparch_tpu.serve.streaming import (  # noqa: F401
    streaming_init,
    streaming_step,
)
