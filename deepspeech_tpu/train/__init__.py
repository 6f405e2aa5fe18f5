from deepspeech_tpu.train.optim import build_optimizer, get_lr, set_lr
from deepspeech_tpu.train.step import (
    InferenceState,
    StepConfig,
    TrainState,
    make_eval_step,
    make_multi_train_step,
    make_train_step,
)

__all__ = [
    "build_optimizer", "get_lr", "set_lr",
    "StepConfig", "TrainState", "make_eval_step", "make_multi_train_step",
    "make_train_step",
]
