"""DiT model tests: shapes, init contract, CFG quirk, torch-parity of
primitive ops (torch CPU used as an independent oracle, not as a source)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.models import DiT, DiT_models, get_2d_sincos_pos_embed
from fast_dit_tpu.models.layers import TimestepEmbedder, modulate
from fast_dit_tpu.ops.attention import dot_product_attention, naive_attention


def small_dit(**kw):
    kw.setdefault("input_size", 16)
    kw.setdefault("patch_size", 2)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("depth", 2)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_classes", 10)
    kw.setdefault("attn_backend", "xla")
    return DiT(**kw)


def init_and_apply(model, B=2, seed=0):
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 4, model.input_size, model.input_size))
    t = jnp.arange(B)
    y = jnp.arange(B) % model.num_classes
    params = model.init({"params": jax.random.PRNGKey(seed)}, x, t, y)
    return params, x, t, y


def test_forward_shape_and_zero_init():
    m = small_dit()
    params, x, t, y = init_and_apply(m)
    out = m.apply(params, x, t, y)
    assert out.shape == (2, 8, 16, 16)  # learn_sigma doubles channels
    # adaLN-Zero + zeroed final layer => exact zero output at init
    # (reference models_original.py:207-216)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_learn_sigma_false():
    m = small_dit(learn_sigma=False)
    params, x, t, y = init_and_apply(m)
    assert m.apply(params, x, t, y).shape == (2, 4, 16, 16)


@pytest.mark.parametrize("name,depth,hidden,patch,heads", [
    ("DiT-XL/2", 28, 1152, 2, 16),
    ("DiT-L/4", 24, 1024, 4, 16),
    ("DiT-B/8", 12, 768, 8, 12),
    ("DiT-S/2", 12, 384, 2, 6),
])
def test_registry_configs(name, depth, hidden, patch, heads):
    m = DiT_models[name]()
    assert m.depth == depth and m.hidden_size == hidden
    assert m.patch_size == patch and m.num_heads == heads


def test_registry_complete():
    dense = {f"DiT-{s}/{p}" for s in ["XL", "L", "B", "S"] for p in [2, 4, 8]}
    moe = {f"DiT-MoE-{s}/2-8E2A" for s in ["XL", "B", "S"]}
    assert set(DiT_models) == dense | moe


def test_xl2_param_count():
    """674,834,720 trainable params == the reference's printed 675,129,632
    (performance/A100/train.out:7) minus the 1x256x1152 frozen pos_embed
    (294,912), which we store as a constant rather than a parameter."""
    m = DiT_models["DiT-XL/2"]()
    params = m.init({"params": jax.random.PRNGKey(0)},
                    jnp.ones((1, 4, 32, 32)), jnp.zeros(1, jnp.int32),
                    jnp.zeros(1, jnp.int32))
    n = sum(p.size for p in jax.tree.leaves(params))
    assert n == 675_129_632 - 294_912 == 674_834_720


def test_unpatchify_inverts_patchify():
    m = small_dit(learn_sigma=True)
    B, C, H = 2, 8, 16
    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, C, H, H))
    p = m.patch_size
    gh = H // p
    x = imgs.reshape(B, C, gh, p, gh, p).transpose(0, 2, 4, 3, 5, 1)
    tokens = x.reshape(B, gh * gh, p * p * C)
    np.testing.assert_allclose(np.asarray(m.unpatchify(tokens)), np.asarray(imgs),
                               rtol=1e-6)


def test_timestep_embedding_order_and_values():
    """cos-first concat with exp(-log(10000) i/half) freqs
    (reference models_original.py:40-59)."""
    t = jnp.array([0.0, 1.0, 250.0])
    emb = TimestepEmbedder.timestep_embedding(t, 8)
    freqs = np.exp(-np.log(10000.0) * np.arange(4, dtype=np.float32) / 4)
    args = np.asarray(t)[:, None] * freqs[None]
    expected = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
    np.testing.assert_allclose(np.asarray(emb), expected, rtol=1e-6, atol=1e-5)
    # t=0: cos part all ones, sin part all zeros
    np.testing.assert_allclose(np.asarray(emb[0, :4]), 1.0)
    np.testing.assert_allclose(np.asarray(emb[0, 4:]), 0.0)


def test_pos_embed_structure():
    """2D table = [h-embed | w-embed], each [sin | cos], fp64 omega ladder
    (reference models_original.py:274-321)."""
    D, G = 16, 4
    pe = get_2d_sincos_pos_embed(D, G)
    assert pe.shape == (G * G, D)
    # position (0,0): sin parts 0, cos parts 1
    np.testing.assert_allclose(pe[0, :4], 0.0)   # first-half sin
    np.testing.assert_allclose(pe[0, 4:8], 1.0)  # first-half cos
    # The grid is meshgrid(w, h) with w FIRST (reference
    # models_original.py:282): the first D/2 encodes the w coordinate.
    # Token 1 = (h=0, w=1): first half changes, second half (h) unchanged.
    assert not np.allclose(pe[1, :8], pe[0, :8])
    np.testing.assert_allclose(pe[1, 8:], pe[0, 8:])
    # token G = (h=1, w=0): first half unchanged, second half changes
    np.testing.assert_allclose(pe[G, :8], pe[0, :8])
    assert not np.allclose(pe[G, 8:], pe[0, 8:])
    # independent value check: w=1 -> sin(1*omega_0)=sin(1), omega_0=1
    np.testing.assert_allclose(pe[1, 0], np.sin(1.0), rtol=1e-12)
    np.testing.assert_allclose(pe[1, 4], np.cos(1.0), rtol=1e-12)


def test_forward_with_cfg_quirk():
    """Guided eps identical across batch halves; channels 3+ pass through
    unguided (reference models_original.py:262)."""
    m = small_dit(class_dropout_prob=0.1)
    params, _, _, _ = init_and_apply(m)
    # non-trivial weights: re-init final layer + adaLN with random values
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.02, params)
    B = 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 16, 16))
    t = jnp.zeros(B, jnp.int32)
    y = jnp.array([1, 2, 10, 10])  # [cond labels ; null ids]
    out = m.apply(params, x, t, y, method=m.forward_with_cfg, cfg_scale=4.0)
    assert out.shape == (B, 8, 16, 16)
    # eps channels equal across halves
    np.testing.assert_allclose(np.asarray(out[:2, :3]), np.asarray(out[2:, :3]),
                               rtol=1e-5, atol=1e-6)
    # unguided channels: each half keeps its own forward output -> differ
    assert not np.allclose(np.asarray(out[:2, 3:]), np.asarray(out[2:, 3:]))

    # sanity: cfg_scale=1 reduces to the conditional eps
    out1 = m.apply(params, x, t, y, method=m.forward_with_cfg, cfg_scale=1.0)
    full = m.apply(params, jnp.concatenate([x[:2], x[:2]]), t, y)
    np.testing.assert_allclose(np.asarray(out1[:2, :3]), np.asarray(full[:2, :3]),
                               rtol=1e-5, atol=1e-6)


def test_label_dropout():
    m = small_dit(class_dropout_prob=0.5)
    params, x, t, y = init_and_apply(m)
    # force-drop: all labels -> null embedding; output equals using label=10
    out_forced = m.apply(params, x, t, y, force_drop_ids=jnp.array([1, 1]))
    out_null = m.apply(params, x, t, jnp.array([10, 10]))
    np.testing.assert_array_equal(np.asarray(out_forced), np.asarray(out_null))
    # train-mode dropout needs the rng and is deterministic given it
    a = m.apply(params, x, t, y, train=True,
                rngs={"label_drop": jax.random.PRNGKey(5)})
    b = m.apply(params, x, t, y, train=True,
                rngs={"label_drop": jax.random.PRNGKey(5)})
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_backends_agree():
    q = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 4, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 4, 8))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 4, 8))
    a = dot_product_attention(q, k, v, backend="xla")
    b = naive_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_flat_projection_path_matches_densegeneral():
    """The Pallas/hybrid attention path projects in flat (B,N,3D)/(B,N,D)
    layouts (_FlatQKV/_FlatProj) while CPU/xla uses nn.DenseGeneral; both
    must define the SAME param tree (values included) and the same math.
    Explicit backend='pallas' exercises the flat path in interpret mode."""
    kw = dict(input_size=16, num_classes=10)
    m_flat = DiT_models["DiT-S/2"](attn_backend="pallas", **kw)
    m_ref = DiT_models["DiT-S/2"](attn_backend="einsum", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
    t = jnp.array([3, 500], jnp.int32)
    y = jnp.array([1, 7], jnp.int32)
    p_flat = m_flat.init({"params": jax.random.PRNGKey(4)}, x, t, y)
    p_ref = m_ref.init({"params": jax.random.PRNGKey(4)}, x, t, y)
    assert (jax.tree_util.tree_structure(p_flat)
            == jax.tree_util.tree_structure(p_ref))
    for a, b in zip(jax.tree_util.tree_leaves(p_flat),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # perturb (zero-init gates/head make the default output trivially 0),
    # then: same params, either path -> same output (fp32 exact kernel,
    # interpret mode)
    leaves, treedef = jax.tree_util.tree_flatten(p_ref)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    p_pert = jax.tree_util.tree_unflatten(
        treedef, [p + 0.03 * jax.random.normal(k, p.shape, p.dtype)
                  for p, k in zip(leaves, keys)])
    out_flat = m_flat.apply(p_pert, x, t, y)
    out_ref = m_ref.apply(p_pert, x, t, y)
    assert float(np.abs(np.asarray(out_ref)).max()) > 0
    np.testing.assert_allclose(np.asarray(out_flat), np.asarray(out_ref),
                               rtol=2e-4, atol=2e-5)


def test_torch_parity_primitives():
    """GELU-tanh / SiLU / LayerNorm / softmax vs torch CPU as an oracle
    (SURVEY.md §7 'fp32 bit-parity with torch' risk)."""
    torch = pytest.importorskip("torch")
    x_np = np.random.RandomState(0).randn(64, 32).astype(np.float32)
    xt = torch.from_numpy(x_np)
    xj = jnp.asarray(x_np)

    np.testing.assert_allclose(
        np.asarray(jax.nn.gelu(xj, approximate=True)),
        torch.nn.functional.gelu(xt, approximate="tanh").numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(jax.nn.silu(xj)),
        torch.nn.functional.silu(xt).numpy(), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jax.nn.softmax(xj, axis=-1)),
        torch.softmax(xt, dim=-1).numpy(), rtol=1e-5, atol=1e-7)
    from flax import linen as nn
    ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)
    got = ln.apply({"params": {}}, xj)
    exp = torch.nn.functional.layer_norm(xt, (32,), eps=1e-6).numpy()
    np.testing.assert_allclose(np.asarray(got), exp, rtol=1e-4, atol=1e-5)


def test_modulate():
    x = jnp.ones((2, 3, 4))
    shift = jnp.full((2, 4), 0.5)
    scale = jnp.full((2, 4), 2.0)
    np.testing.assert_allclose(np.asarray(modulate(x, shift, scale)), 3.5)


def test_dtype_bf16_activations():
    m = small_dit(dtype=jnp.bfloat16)
    params, x, t, y = init_and_apply(m)
    # params stay fp32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
    out = m.apply(params, x, t, y)
    assert out.dtype == jnp.float32  # output cast back to fp32
    assert np.isfinite(np.asarray(out)).all()


def test_remat_matches_no_remat():
    a = small_dit(remat=False)
    b = small_dit(remat=True)
    params, x, t, y = init_and_apply(a)
    out_a = a.apply(params, x, t, y)
    out_b = b.apply(params, x, t, y)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)
    # and gradients agree
    def loss(mod):
        def f(p):
            return jnp.sum(mod.apply(p, x, t, y) ** 2)
        return f
    # non-zero params so grads are non-trivial
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(7), p.shape) * 0.02, params)
    ga = jax.grad(loss(a))(params)
    gb = jax.grad(loss(b))(params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("policy", ["attn", "attn_mlp"])
def test_selective_remat_matches_no_remat(policy):
    """Selective remat (save attention / MLP outputs instead of recomputing)
    must be a pure speed/memory trade — outputs and grads unchanged."""
    a = small_dit(remat=False)
    b = small_dit(remat=True, remat_policy=policy)
    params, x, t, y = init_and_apply(a)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(3), p.shape) * 0.02,
        params)
    np.testing.assert_allclose(np.asarray(a.apply(params, x, t, y)),
                               np.asarray(b.apply(params, x, t, y)), atol=1e-6)
    ga = jax.grad(lambda p: jnp.sum(a.apply(p, x, t, y) ** 2))(params)
    gb = jax.grad(lambda p: jnp.sum(b.apply(p, x, t, y) ** 2))(params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)


def test_512_config_shapes():
    """XL/2 at 512x512: 64x64 latents, 1024 tokens (SURVEY.md §5 sequence
    scaling) — shape-checked abstractly (no FLOPs)."""
    m = DiT_models["DiT-XL/2"](input_size=64)
    params = jax.eval_shape(
        lambda: m.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 4, 64, 64)), jnp.zeros((1,), jnp.int32),
                       jnp.zeros((1,), jnp.int32)))
    out = jax.eval_shape(
        lambda p: m.apply(p, jnp.zeros((2, 4, 64, 64)), jnp.zeros((2,), jnp.int32),
                          jnp.zeros((2,), jnp.int32)), params)
    assert out.shape == (2, 8, 64, 64)
    # patch-size trade-off configs cover the same image at fewer tokens
    for name, tokens in [("DiT-XL/4", 256), ("DiT-XL/8", 64)]:
        mm = DiT_models[name](input_size=64)
        assert mm.num_patches == tokens
