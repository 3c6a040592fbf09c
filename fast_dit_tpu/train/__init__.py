"""Training layer: jitted train step with EMA/AdamW, sharded over a mesh."""

from .train_lib import (
    TrainState,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    update_ema,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_sharded_train_step",
    "make_train_step",
    "update_ema",
]
