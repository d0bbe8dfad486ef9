from sparch_tpu.serve.predictor import (  # noqa: F401
    Predictor,
    load_experiment,
)
from sparch_tpu.serve.streaming import (  # noqa: F401
    streaming_init,
    streaming_step,
)
