from sparch_tpu.train.loop import Experiment  # noqa: F401
from sparch_tpu.train.schedule import ReduceLROnPlateau  # noqa: F401
from sparch_tpu.train.state import TrainState, create_train_state  # noqa: F401
from sparch_tpu.train.steps import make_eval_step, make_train_step  # noqa: F401
from sparch_tpu.train.checkpoint import (  # noqa: F401
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
