"""Attention backend dispatch.

The reference delegates attention to timm's `Attention` module
(`/root/reference/train_options/models_original.py:108`), i.e. a naive
softmax(QK^T)V in torch. Here attention is a pluggable op with three
implementations:

- "xla":    `jax.nn.dot_product_attention` — XLA's fused attention; the
            default on CPU and the fallback everywhere.
- "pallas": our flash-attention TPU kernel (`ops/flash_attention.py`):
            K/V-blocked online-softmax forward + fused Pallas backward,
            bf16-friendly with fp32 accumulation.
- "einsum": reference-shaped naive attention, used in tests as the numerical
            ground truth.

All take (B, S, H, D) q/k/v and return (B, S, H, D).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention", "naive_attention", "resolve_backend"]


def naive_attention(q, k, v, scale=None):
    """softmax(q k^T / sqrt(d)) v, computed the obvious way (fp32 softmax)."""
    B, S, H, D = q.shape
    scale = D ** -0.5 if scale is None else scale
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


@functools.cache
def _has_pallas_support() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def resolve_backend(backend: str, seq_len: int = 256) -> str:
    if backend == "auto":
        if not _has_pallas_support():
            return "xla"
        # Measured on v5e inside the FULL DiT-XL/2 model (docs/ABLATIONS.md):
        # - 256 tokens (256² p2): XLA wins (1.40 vs 0.98 img/s sampling) —
        #   the custom call breaks XLA's surrounding fusions at short
        #   sequences even though the kernel wins in isolation.
        # - 1024 tokens (512² p2): the flash kernel wins (0.216 vs 0.182
        #   img/s, +19%) — the K/V-blocked online softmax pays off once the
        #   score matrix dominates.
        # The kernel is also the more PRECISE path for fp32 parity work:
        # 9e-7 vs ~5e-3 against an fp64 oracle.
        return "pallas" if seq_len >= 512 else "xla"
    return backend


def dot_product_attention(q, k, v, *, backend: str = "auto", scale=None):
    """Dispatch attention to the chosen backend. q/k/v: (B, S, H, D)."""
    backend = resolve_backend(backend, q.shape[1])
    if backend == "pallas":
        from .flash_attention import flash_attention

        return flash_attention(q, k, v, scale=scale)
    if backend == "xla":
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if backend == "einsum":
        return naive_attention(q, k, v, scale=scale)
    raise ValueError(f"unknown attention backend: {backend}")
