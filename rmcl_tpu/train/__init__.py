from rmcl_tpu.train.schedule import (  # noqa: F401
    make_lr_schedule, make_optimizer, param_group_labels)
from rmcl_tpu.train.step import (  # noqa: F401
    TrainState, create_train_state, make_train_step, make_eval_step)
