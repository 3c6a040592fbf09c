"""Novel-view-synthesis extensions (the reference's ring-3 research layer,
rebuilt as one clean module: geometry, warping, DINO conditioning, metrics)."""

from . import geometry, metrics, warp
from .conditioning import CrossAttention, DiTCrossBlock, DiTNVS

__all__ = ["geometry", "metrics", "warp", "CrossAttention", "DiTCrossBlock", "DiTNVS"]
