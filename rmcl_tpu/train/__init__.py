from rmcl_tpu.train.schedule import (  # noqa: F401
    make_lr_schedule, make_optimizer, param_group_labels)
from rmcl_tpu.train.step import (  # noqa: F401
    TrainState, create_train_state, make_train_step, make_eval_step)
from rmcl_tpu.train.checkpoint import CheckpointManager  # noqa: F401
from rmcl_tpu.train.logging import MetricLogger, profile_steps  # noqa: F401
from rmcl_tpu.train.loop import Trainer  # noqa: F401
