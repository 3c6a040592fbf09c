"""Pallas flash-attention kernel tests (interpret mode on CPU; the same code
compiles via Mosaic on TPU — verified on hardware, see bench).

fwd_impl="pallas" forces the Pallas forward so interpret mode covers the
kernel (the default "auto" keeps XLA's flops-peak forward below 512 tokens
and only swaps in the fused Pallas backward — see ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.ops.attention import naive_attention
from fast_dit_tpu.ops.flash_attention import flash_attention


def np_attention(q, k, v):
    """fp64 numpy oracle."""
    D = q.shape[-1]
    q, k, v = (np.asarray(x, np.float64) for x in (q, k, v))
    logits = np.einsum("bqhd,bkhd->bhqk", q, k) * (D ** -0.5)
    logits -= logits.max(-1, keepdims=True)
    p = np.exp(logits)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v).astype(np.float32)


@pytest.mark.parametrize("B,S,H,D", [
    (2, 256, 4, 64),    # DiT-S/B-like
    (1, 256, 16, 72),   # DiT-XL head_dim 72 (needs lane padding)
    (2, 100, 4, 60),    # unaligned seq AND head dim (masked key rows)
    (1, 1024, 2, 72),   # 512x512 token count
])
def test_matches_oracle(B, S, H, D):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    got = np.asarray(flash_attention(q, k, v, fwd_impl="pallas"))
    expected = np_attention(q, k, v)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,S,H,D", [
    (2, 64, 4, 32),     # single q-block
    (1, 300, 2, 72),    # padded seq + padded head dim (masked key rows)
    (1, 1024, 2, 72),   # 512x512 token count: multiple q-blocks, dk/dv
                        # accumulated across the q-block grid
])
def test_pallas_backward_matches_naive(B, S, H, D):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))

    ga = jax.grad(lambda *a: jnp.sum(flash_attention(*a, fwd_impl="pallas") ** 2), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(lambda *a: jnp.sum(naive_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_online_softmax_multi_k_block():
    """Sequences beyond one K block stream K/V with running max/denominator;
    result must be identical to single-pass softmax."""
    B, S, H, D = 1, 1536, 1, 64  # 2 K blocks of 1024/512
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    got = np.asarray(flash_attention(q, k, v, fwd_impl="pallas"))
    np.testing.assert_allclose(got, np_attention(q, k, v), rtol=1e-5, atol=1e-5)


def test_bf16_gradients():
    shape = (1, 128, 2, 64)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
               for i in range(3))
    loss = lambda att: lambda *a: jnp.sum(att(*a).astype(jnp.float32) ** 2)
    ga = jax.grad(loss(lambda *a: flash_attention(*a, fwd_impl="pallas")), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(loss(naive_attention), argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(ga, gb):
        assert x.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(x, np.float32),
                                   np.asarray(y, np.float32),
                                   rtol=1e-1, atol=1e-1)


def test_bf16_io():
    shape = (1, 128, 4, 64)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
               for i in range(3))
    out = flash_attention(q, k, v, fwd_impl="pallas")
    assert out.dtype == jnp.bfloat16
    expected = np_attention(*(np.asarray(u, np.float32) for u in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               rtol=2e-2, atol=2e-2)


def test_custom_scale():
    shape = (1, 64, 2, 32)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(3))
    a = flash_attention(q, k, v, scale=0.5, fwd_impl="pallas")
    b = naive_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_jit_and_vmap_compose():
    shape = (2, 64, 2, 32)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(3))
    out = jax.jit(lambda *a: flash_attention(*a, fwd_impl="pallas"))(q, k, v)
    assert out.shape == shape


def test_resolve_backend_dispatch():
    """'auto' ON TPU dispatches on whether XLA's forward can keep the
    (B, H, S, S) probabilities VMEM-resident (hybrid = XLA fwd + Pallas bwd)
    or they spill to HBM (full Pallas) — measured crossover,
    docs/ABLATIONS.md; always XLA off-TPU; explicit choices pass through."""
    from unittest import mock

    from fast_dit_tpu.ops import attention

    for explicit in ("xla", "pallas", "hybrid", "einsum"):
        assert attention.resolve_backend(explicit, 256) == explicit
    # off-TPU (this CPU test env): auto is always XLA
    assert attention.resolve_backend("auto", 1024) == "xla"
    with mock.patch.object(attention, "_has_pallas_support", lambda: True):
        # batch-aware: probs bytes = 2*B*H*S^2 vs the 64 MB residency bound
        assert attention.resolve_backend("auto", 256, 16, 16) == "hybrid"   # 33 MB
        assert attention.resolve_backend("auto", 256, 128, 16) == "pallas"  # 268 MB
        assert attention.resolve_backend("auto", 1024, 16, 16) == "pallas"  # 536 MB
        # batch unknown: seq-length crossover fallback
        assert attention.resolve_backend("auto", 256) == "hybrid"
        assert attention.resolve_backend("auto", 512) == "pallas"
        assert attention.resolve_backend("auto", 1024) == "pallas"
        # fp32 activations: auto stays XLA (the kernel wins are bf16-only;
        # fp32 kernels are the HIGHEST-precision parity path), but explicit
        # requests pass through
        import jax.numpy as jnp
        assert attention.resolve_backend("auto", 256, 128, 16,
                                         jnp.float32) == "xla"
        assert attention.resolve_backend("auto", 256, 128, 16,
                                         jnp.bfloat16) == "pallas"
        assert attention.resolve_backend("pallas", 256, 128, 16,
                                         jnp.float32) == "pallas"


def test_hybrid_backward_matches_naive():
    """The hybrid path's forward is XLA but its backward is the fused Pallas
    dqkv kernel — gradients must match the naive VJP."""
    shape = (2, 64, 4, 32)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(3))
    ga = jax.grad(lambda *a: jnp.sum(flash_attention(*a, fwd_impl="xla") ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(lambda *a: jnp.sum(naive_attention(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-5)


def test_fast_softmax_bf16_backward():
    """bf16 inputs take the reduction-free softmax (clamped logits, MXU row
    sums, folded denominators) in both kernels; must agree with naive
    attention to bf16 tolerance."""
    shape = (1, 128, 2, 64)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
               for i in range(3))
    loss = lambda att: lambda *a: jnp.sum(att(*a).astype(jnp.float32) ** 2)
    for impl in ("pallas", "xla"):
        out = flash_attention(q, k, v, fwd_impl=impl)
        np.testing.assert_allclose(
            np.asarray(out, np.float32),
            np_attention(*(np.asarray(u, np.float32) for u in (q, k, v))),
            rtol=2e-2, atol=2e-2)
        ga = jax.grad(loss(lambda *a: flash_attention(*a, fwd_impl=impl)),
                      argnums=(0, 1, 2))(q, k, v)
        gb = jax.grad(loss(naive_attention), argnums=(0, 1, 2))(q, k, v)
        for x, y in zip(ga, gb):
            np.testing.assert_allclose(np.asarray(x, np.float32),
                                       np.asarray(y, np.float32),
                                       rtol=1e-1, atol=1e-1)
