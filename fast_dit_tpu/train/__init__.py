"""Training layer: jitted train step with EMA/AdamW, sharded over a mesh."""

from .mixed_precision import MasterWeightsState, get_master_params, masterize
from .train_lib import (
    TrainState,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    update_ema,
)

__all__ = [
    "MasterWeightsState",
    "get_master_params",
    "masterize",
    "TrainState",
    "create_train_state",
    "make_sharded_train_step",
    "make_train_step",
    "update_ema",
]
