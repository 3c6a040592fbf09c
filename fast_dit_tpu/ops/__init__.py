"""Hot ops: attention backends (XLA fused / Pallas flash / naive einsum),
int8 quantized projections, token merging, fused optimizer sweep."""

from .attention import dot_product_attention, naive_attention, resolve_backend
from .quant import int8_matmul
from .tome import bipartite_soft_matching_2d, tome_merge_count

__all__ = ["bipartite_soft_matching_2d", "dot_product_attention",
           "int8_matmul", "naive_attention", "resolve_backend",
           "tome_merge_count"]
