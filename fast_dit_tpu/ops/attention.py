"""Attention backend dispatch.

The reference delegates attention to timm's `Attention` module
(`/root/reference/train_options/models_original.py:108`), i.e. a naive
softmax(QK^T)V in torch. Here attention is a pluggable op:

- "xla":    `jax.nn.dot_product_attention` — XLA's fused attention; the
            default on CPU and the short-sequence forward champion on TPU
            (a single VMEM-resident fusion at ~80% of flops peak at 256
            tokens — see ops/flash_attention.py module docstring).
- "hybrid": XLA forward + our fused Pallas backward (custom_vjp). The
            backward is where XLA loses: its attention VJP materializes the
            (B, H, S, S) probabilities through HBM; the Pallas backward
            recomputes the softmax in VMEM and emits packed dqkv in one
            sweep. Identical forward numerics/speed to "xla".
- "pallas": full Pallas forward + fused backward (`ops/flash_attention.py`)
            — wins at long sequences (>= 512 tokens).
- "einsum": reference-shaped naive attention, used in tests as the numerical
            ground truth.
- "ring:<axis>": exact sequence-parallel ring attention over a sharded
            token axis (`ops/ring_attention.py`) — for use inside shard_map
            with mesh axis `<axis>` bound (parallel/sequence.py).

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


# Above this many bytes of per-layer probability matrices (B*H*S^2*2 in
# bf16), XLA's forward attention can no longer keep them VMEM-resident and
# becomes HBM-bandwidth-bound — the regime where the Pallas forward wins.
_XLA_FWD_RESIDENCY_BYTES = 64 * 1024 * 1024


def resolve_backend(backend: str, seq_len: int = 256, batch: int | None = None,
                    num_heads: int = 16, dtype=None) -> str:
    """Pick the attention implementation.

    'auto' on TPU dispatches on the MECHANISM, not just seq length
    (measured on v5e inside the full DiT-XL/2 model, docs/ABLATIONS.md):

    - When the (B, H, S, S) probabilities fit in VMEM (sampling bs16 at 256
      tokens: 33 MB), XLA's forward fusion runs at ~flops peak (24 us/layer
      vs 24 us ideal) and every Pallas forward variant tried is 4-10x
      slower => keep the XLA forward, swap in the fused Pallas backward
      ("hybrid": +9% train steps/sec from the backward alone).
    - Once the probabilities spill to HBM (train bs128 at 256 tokens:
      268 MB/layer, measured 653-745 GB/s bandwidth-bound; any batch at
      1024 tokens), the Pallas forward wins too => full "pallas"
      (+11.4% train steps/sec at XL/2 bs128, +19% sampling at 1024 tokens).

    With batch unknown, falls back to the seq-length crossover alone.

    'auto' with fp32 activations stays on "xla": the kernel wins above were
    measured in bf16 (the fp32 kernels run exact row-max softmax at HIGHEST
    precision — the parity path, not a throughput path), and the fp32
    Pallas backward inside the largest remat+grad-accum train programs has
    crashed the remote compile service. Explicit "pallas"/"hybrid" still
    honor the request at any dtype.
    """
    if backend.startswith("ring"):
        # sequence-parallel ring attention ("ring:<mesh-axis>"); only valid
        # inside shard_map with that axis bound — never chosen by 'auto'
        if not (backend.startswith("ring:") and backend.split(":", 1)[1]):
            raise ValueError(
                f"ring attention backend must be 'ring:<mesh-axis>' with a "
                f"non-empty axis name, got {backend!r}")
        return backend
    if backend == "auto":
        if not _has_pallas_support():
            return "xla"
        if dtype is not None and jnp.dtype(dtype) == jnp.float32:
            return "xla"
        if batch is None:
            return "pallas" if seq_len >= 512 else "hybrid"
        probs_bytes = 2 * batch * num_heads * seq_len * seq_len
        return "pallas" if probs_bytes > _XLA_FWD_RESIDENCY_BYTES else "hybrid"
    return backend


def dot_product_attention(q, k, v, *, backend: str = "auto", scale=None):
    """Dispatch attention to the chosen backend. q/k/v: (B, S, H, D)."""
    backend = resolve_backend(backend, q.shape[1], q.shape[0], q.shape[2],
                              q.dtype)
    if backend in ("pallas", "hybrid"):
        from .flash_attention import flash_attention

        return flash_attention(
            q, k, v, scale=scale,
            fwd_impl="pallas" if backend == "pallas" else "xla")
    if backend == "xla":
        return jax.nn.dot_product_attention(q, k, v, scale=scale)
    if backend == "einsum":
        return naive_attention(q, k, v, scale=scale)
    if backend.startswith("ring:"):
        from .ring_attention import ring_attention

        return ring_attention(q, k, v, axis=backend.split(":", 1)[1],
                              scale=scale)
    raise ValueError(f"unknown attention backend: {backend}")
