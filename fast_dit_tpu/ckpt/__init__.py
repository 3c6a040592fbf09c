"""Checkpoint layer: torch `.pt` import/export (reference compatibility),
pretrained-name resolver, and orbax native checkpoints."""

from .download import download_model, find_model, pretrained_models
from .orbax_io import CheckpointManager, restore_checkpoint, save_checkpoint
from .torch_import import (
    flax_to_state_dict,
    import_dit_checkpoint,
    load_torch_checkpoint,
    state_dict_to_flax,
)

__all__ = [
    "download_model",
    "find_model",
    "pretrained_models",
    "CheckpointManager",
    "restore_checkpoint",
    "save_checkpoint",
    "flax_to_state_dict",
    "import_dit_checkpoint",
    "load_torch_checkpoint",
    "state_dict_to_flax",
]
