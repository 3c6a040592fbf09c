"""Sequence (context) parallelism: exactness + gradient proofs on the CPU
mesh. The reference has no sequence-parallel story at all (SURVEY.md §2.3);
ring attention must therefore be pinned against the dense math, not against
reference behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from fast_dit_tpu.models import DiT
from fast_dit_tpu.ops.attention import naive_attention
from fast_dit_tpu.ops.ring_attention import ring_attention
from fast_dit_tpu.parallel.sequence import (create_seq_mesh,
                                            dit_sequence_parallel_forward,
                                            sequence_parallel_stack)


def qkv(B=2, S=32, H=4, hd=8, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, S, H, hd)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


def ring_on_mesh(q, k, v, n, scale=None):
    mesh = create_seq_mesh(n)
    fn = lambda a, b, c: ring_attention(a, b, c, axis="seq", scale=scale)
    return shard_map(fn, mesh=mesh,
                     in_specs=(P(None, "seq"),) * 3,
                     out_specs=P(None, "seq"), check_vma=False)(q, k, v)


@pytest.mark.parametrize("n", [2, 4, 8])
def test_ring_attention_exact(n):
    """Ring attention over n shards == dense attention, to fp32 tolerance."""
    q, k, v = qkv()
    want = naive_attention(q, k, v)
    got = ring_on_mesh(q, k, v, n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_custom_scale():
    q, k, v = qkv(seed=3)
    want = naive_attention(q, k, v, scale=0.31)
    got = ring_on_mesh(q, k, v, 4, scale=0.31)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_gradients_match_dense():
    """d(loss)/d(q,k,v) through the sharded ring == through dense attention —
    the property that makes sequence-PARALLEL TRAINING valid."""
    q, k, v = qkv(seed=1)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_dense(q, k, v):
        return jnp.sum((naive_attention(q, k, v) - tgt) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum((ring_on_mesh(q, k, v, 4) - tgt) ** 2)

    g_want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def qkv_bf16(B=2, S=64, H=2, hd=64, seed=0):
    """Lane-aligned (H*hd % 128 == 0) bf16 inputs -> the Pallas hop path."""
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, S, H, hd)
    return tuple((jax.random.normal(k, shape, jnp.float32) * 0.5)
                 .astype(jnp.bfloat16) for k in ks)


@pytest.mark.parametrize("n", [2, 4])
def test_ring_attention_pallas_bf16_matches_dense(n):
    """bf16 + lane-aligned D dispatches to the Pallas hop kernel (interpret
    mode on CPU); must match dense attention to bf16 tolerance."""
    q, k, v = qkv_bf16()
    want = naive_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32))
    got = ring_on_mesh(q, k, v, n)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_ring_attention_pallas_bf16_gradients():
    """Gradients through the Pallas hop custom-VJP (scan + ppermute around
    it) == dense-attention gradients, to bf16 tolerance — the property that
    makes the kernel valid for sequence-parallel training."""
    q, k, v = qkv_bf16(seed=2)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss_dense(q, k, v):
        out = naive_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32))
        return jnp.sum((out - tgt) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum((ring_on_mesh(q, k, v, 4).astype(jnp.float32)
                        - tgt) ** 2)

    g_want = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=5e-2, atol=5e-2)


def test_ring_attention_bf16_unaligned_falls_back():
    """bf16 with H*hd % 128 != 0 must take the XLA streaming path and stay
    correct (the kernel's lane-slicing precondition is a dispatch gate, not
    a crash)."""
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = (jax.random.normal(kk, (2, 32, 4, 8), jnp.float32)
               .astype(jnp.bfloat16) for kk in ks)
    want = naive_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32))
    got = ring_on_mesh(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=2e-2, atol=2e-2)


def test_ring_hop_kernel_vjp_matches_xla_reference():
    """The hop kernel's (o_u, l) AND its hand-written backward kernel ==
    the same clamped-softmax math written in plain XLA, under jax.grad with
    fp32 inputs (HIGHEST-precision MXU passes in interpret mode): pins the
    custom-VJP math itself, independent of the ring/mesh plumbing."""
    from fast_dit_tpu.ops.ring_attention import _ring_hop

    B, Sq, Sk, H, hd = 2, 32, 48, 2, 64
    key = jax.random.PRNGKey(11)
    q, kb, vb = (jax.random.normal(k, (B, s, H * hd), jnp.float32) * 0.5
                 for k, s in zip(jax.random.split(key, 3), (Sq, Sk, Sk)))
    w_o = jax.random.normal(jax.random.PRNGKey(1), (B, Sq, H * hd))
    w_l = jax.random.normal(jax.random.PRNGKey(2), (B, Sq, H))
    scale = hd ** -0.5

    def ref_hop(q, kb, vb):
        qh = q.reshape(B, Sq, H, hd)
        kh = kb.reshape(B, Sk, H, hd)
        vh = vb.reshape(B, Sk, H, hd)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       precision=jax.lax.Precision.HIGHEST) * scale
        p_u = jnp.exp(jnp.minimum(s, 50.0))
        o = jnp.einsum("bhqk,bkhd->bqhd", p_u, vh,
                       precision=jax.lax.Precision.HIGHEST)
        return o.reshape(B, Sq, H * hd), p_u.sum(-1).transpose(0, 2, 1)

    def loss(hop_fn, q, kb, vb):
        o, l = hop_fn(q, kb, vb)
        return jnp.sum(o * w_o) + jnp.sum(l * w_l)

    got_o, got_l = _ring_hop(q, kb, vb, scale, H)
    want_o, want_l = ref_hop(q, kb, vb)
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_l), np.asarray(want_l),
                               rtol=1e-5, atol=1e-5)
    g_got = jax.grad(lambda *a: loss(
        lambda q, kb, vb: _ring_hop(q, kb, vb, scale, H), *a),
        argnums=(0, 1, 2))(q, kb, vb)
    g_want = jax.grad(lambda *a: loss(ref_hop, *a),
                      argnums=(0, 1, 2))(q, kb, vb)
    for a, b in zip(g_got, g_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_ring_hop_hybrid_matches_kernel():
    """The hybrid hop (XLA forward + Pallas backward) computes the same
    clamped-partials contract as the full-Pallas hop — outputs AND grads, so
    the _HOP_PALLAS_FWD_MIN_SEQ dispatch is a pure speed decision."""
    from fast_dit_tpu.ops.ring_attention import _ring_hop, _ring_hop_hybrid

    B, Sq, Sk, H, hd = 2, 32, 48, 2, 64
    key = jax.random.PRNGKey(17)
    q, kb, vb = (jax.random.normal(k, (B, s, H * hd), jnp.float32) * 0.5
                 for k, s in zip(jax.random.split(key, 3), (Sq, Sk, Sk)))
    w_o = jax.random.normal(jax.random.PRNGKey(3), (B, Sq, H * hd))
    w_l = jax.random.normal(jax.random.PRNGKey(4), (B, Sq, H))
    scale = hd ** -0.5

    for i, (a, b) in enumerate(zip(_ring_hop(q, kb, vb, scale, H),
                                   _ring_hop_hybrid(q, kb, vb, scale, H))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=f"out {i}")

    def loss(hop, q, kb, vb):
        o, l = hop(q, kb, vb, scale, H)
        return jnp.sum(o * w_o) + jnp.sum(l * w_l)

    g_k = jax.grad(lambda *a: loss(_ring_hop, *a), argnums=(0, 1, 2))(
        q, kb, vb)
    g_h = jax.grad(lambda *a: loss(_ring_hop_hybrid, *a), argnums=(0, 1, 2))(
        q, kb, vb)
    for a, b in zip(g_h, g_k):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_ring_backend_string_outside_shardmap_fails():
    """'ring:<axis>' requires the mesh axis to be bound — a clear error, not
    silent garbage."""
    q, k, v = qkv()
    from fast_dit_tpu.ops.attention import dot_product_attention
    with pytest.raises(Exception):
        dot_product_attention(q, k, v, backend="ring:seq")


def tiny_dit(depth=4, **kw):
    return DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
               depth=depth, num_heads=4, num_classes=10,
               attn_backend="einsum", **kw)


def init_params(model, B=4):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 8, 8))
    t = jnp.arange(B) % 10
    y = jnp.arange(B) % 10
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, y)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape) * 0.05,
        params)
    return params, x, t, y


@pytest.mark.parametrize("seq,data", [(2, 1), (4, 1), (8, 1), (4, 2)])
def test_dit_sequence_parallel_forward_equivalence(seq, data):
    """Token-sharded DiT forward == the plain nn.scan forward, for several
    seq-axis sizes and composed with data parallelism."""
    model = tiny_dit()
    params, x, t, y = init_params(model, B=4)
    want = model.apply(params, x, t, y)

    mesh = create_seq_mesh(seq, data=data)
    got = dit_sequence_parallel_forward(model, params, x, t, y, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)


def test_sequence_parallel_stack_gradients():
    """Gradients through the token-sharded block stack == unsharded — proves
    the whole sp training path (scan over blocks + ring attention)."""
    from fast_dit_tpu.models.layers import DiTBlock

    model = tiny_dit()
    params, x, t, y = init_params(model, B=2)
    stacked = params["params"]["blocks"]["block"]
    tokens = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 32))
    c = jax.random.normal(jax.random.PRNGKey(6), (2, 32))

    block_ring = DiTBlock(32, 4, attn_backend="ring:seq")
    block_ref = DiTBlock(32, 4, attn_backend="einsum")
    mesh = create_seq_mesh(4)

    def loss_sp(sp):
        out = sequence_parallel_stack(
            lambda lp, xs, cs: block_ring.apply({"params": lp}, xs, cs),
            sp, tokens, c, mesh=mesh)
        return jnp.sum(out ** 2)

    def loss_ref(sp):
        def body(carry, lp):
            return block_ref.apply({"params": lp}, carry, c), None
        out, _ = jax.lax.scan(body, tokens, sp)
        return jnp.sum(out ** 2)

    g_got = jax.grad(loss_sp)(stacked)
    g_want = jax.grad(loss_ref)(stacked)
    flat_got = jax.tree.leaves(g_got)
    flat_want = jax.tree.leaves(g_want)
    assert len(flat_got) == len(flat_want)
    for a, b in zip(flat_got, flat_want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
