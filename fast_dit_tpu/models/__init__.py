"""Model layer: DiT backbones (registry parity with the reference's
`DiT_models`, models_original.py:365-370) plus the SD-VAE autoencoder."""

from .dit import DiT, DiT_models, dit_config
from .layers import (
    Attention,
    DiTBlock,
    FinalLayer,
    LabelEmbedder,
    Mlp,
    PatchEmbed,
    TimestepEmbedder,
    modulate,
)
from .pos_embed import get_2d_sincos_pos_embed

__all__ = [
    "DiT",
    "DiT_models",
    "dit_config",
    "Attention",
    "DiTBlock",
    "FinalLayer",
    "LabelEmbedder",
    "Mlp",
    "PatchEmbed",
    "TimestepEmbedder",
    "modulate",
    "get_2d_sincos_pos_embed",
]
