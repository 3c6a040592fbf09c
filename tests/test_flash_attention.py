"""Pallas flash-attention kernel tests (interpret mode on CPU; the same code
compiles via Mosaic on TPU — verified on hardware, see bench)."""

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
    (2, 100, 4, 60),    # unaligned seq AND head dim
    (1, 1024, 2, 72),   # 512x512 token count
])
def test_matches_oracle(B, S, H, D):
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))
    got = np.asarray(flash_attention(q, k, v))
    expected = np_attention(q, k, v)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)


def test_gradients_match_naive():
    shape = (2, 64, 4, 32)
    q = jax.random.normal(jax.random.PRNGKey(0), shape)
    k = jax.random.normal(jax.random.PRNGKey(1), shape)
    v = jax.random.normal(jax.random.PRNGKey(2), shape)

    ga = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    gb = jax.grad(lambda *a: jnp.sum(naive_attention(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-4, atol=1e-5)


def test_bf16_io():
    shape = (1, 128, 4, 64)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
               for i in range(3))
    out = flash_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    expected = np_attention(*(np.asarray(u, np.float32) for u in (q, k, v)))
    np.testing.assert_allclose(np.asarray(out, np.float32), expected,
                               rtol=2e-2, atol=2e-2)


def test_custom_scale():
    shape = (1, 64, 2, 32)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(3))
    a = flash_attention(q, k, v, scale=0.5)
    b = naive_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_jit_and_vmap_compose():
    shape = (2, 64, 2, 32)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape) for i in range(3))
    out = jax.jit(flash_attention)(q, k, v)
    assert out.shape == shape
