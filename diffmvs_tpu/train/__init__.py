"""Training subsystem: state, step functions, schedules, checkpointing."""

from diffmvs_tpu.train.state import MVSTrainState, create_train_state  # noqa: F401
from diffmvs_tpu.train.schedules import make_lr_schedule  # noqa: F401
from diffmvs_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
