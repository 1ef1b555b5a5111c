"""Training runtime (layer L5): fused jitted D+G step, optax, orbax, loop."""

from ircolor_tpu.train.schedule import linear_decay_factor, make_lr_schedule
from ircolor_tpu.train.state import TrainState, create_train_state
from ircolor_tpu.train.step import make_train_step, make_val_step
from ircolor_tpu.train.loop import train_kaist

__all__ = [
    "linear_decay_factor",
    "make_lr_schedule",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_val_step",
    "train_kaist",
]
