"""Hot ops: attention backends (XLA fused / Pallas flash / naive einsum),
int8 quantized projections, fused optimizer sweep."""

from .attention import dot_product_attention, naive_attention, resolve_backend
from .quant import int8_matmul

__all__ = ["dot_product_attention", "naive_attention", "resolve_backend",
           "int8_matmul"]
