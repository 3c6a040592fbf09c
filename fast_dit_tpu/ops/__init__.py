"""Hot ops: attention backends (XLA fused / Pallas flash / naive einsum)."""

from .attention import dot_product_attention, naive_attention, resolve_backend

__all__ = ["dot_product_attention", "naive_attention", "resolve_backend"]
