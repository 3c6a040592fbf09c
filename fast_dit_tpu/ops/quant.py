"""Int8 quantized dense layers for inference (W8A8, dynamic per-token).

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 flops rate
(394 vs 197 Tops peak) — the only honest-compute throughput lever left for
DiT sampling once bf16 attention/matmuls are at their roofline (see
docs/ABLATIONS.md). The reference has no quantized path at all (torch fp16
AMP is its lowest precision, `/root/reference/train_options/train_amp.py`);
this is TPU-native headroom, exposed as `--quantize w8a8` on sample.py and
off by default.

Scheme (standard symmetric W8A8, e.g. SmoothQuant's per-token/per-channel
baseline without the smoothing):

- activations: dynamic per-token (row) scales — absmax/127 over the
  contraction axis, computed in fp32 each call (the rows are what the MXU
  streams; the absmax is a cheap VPU pass over data already in registers);
- weights: per-output-channel (column) scales, quantized in-graph from the
  SAME fp32/bf16 param tree the bf16 path uses (no separate checkpoint, no
  importer changes; the quantize cost is O(K*N) vs the matmul's O(R*K*N) —
  under 1% at DiT shapes, and XLA hoists it out of the sampling scan as a
  loop invariant when it can);
- accumulation: int32, dequantized by (row_scale x col_scale) in fp32, bias
  added in fp32, then cast back to the activation dtype.

Only the token-indexed projections are quantized (qkv, attention out-proj,
MLP fc1/fc2 — ~99% of DiT block flops). The attention core, LayerNorms,
adaLN modulation (batch-indexed, tiny), embedders, and final head stay in
the activation dtype. Inference-only: round() has zero gradient, so the
model guards `quant` against train mode.

Accuracy is a precision trade measured like every approximation here:
mechanism-level drift vs the bf16 exact sampler in benchmarks/frontier.py
(--quantize) and tests/test_quant.py tolerance pins; real-weight FID needs
the offline-unavailable checkpoints.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["int8_matmul", "quantize_rows", "quantize_cols", "QUANT_MODES"]

QUANT_MODES = ("w8a8",)


def quantize_rows(x):
    """(R, K) float -> (int8 (R, K), fp32 (R, 1) scale), symmetric absmax."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def quantize_cols(w):
    """(K, N) float -> (int8 (K, N), fp32 (1, N) scale), per output channel."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_matmul(x, w, bias=None, out_dtype=None):
    """Quantized x @ w over the last/first axes with fp32 dequantization.

    x: (..., K) activations (any float dtype), w: (K, N) weights.
    Returns (..., N) in `out_dtype` (defaults to x.dtype).
    """
    out_dtype = x.dtype if out_dtype is None else out_dtype
    lead = x.shape[:-1]
    K = x.shape[-1]
    xq, xs = quantize_rows(x.reshape(-1, K))
    wq, ws = quantize_cols(w)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs * ws
    if bias is not None:
        out = out + bias.astype(jnp.float32).reshape(-1)
    return out.reshape(*lead, w.shape[-1]).astype(out_dtype)
