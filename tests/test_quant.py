"""Int8 (W8A8) quantized inference path: ops/quant.py + the model plumbing.

The reference has no quantized path (fp16 AMP is its floor,
`/root/reference/train_options/train_amp.py`); this is TPU-native headroom
(2x int8 MXU throughput on v5e). These tests pin the three contracts:
numerical closeness to the float path, param-tree identity (checkpoints
trained in bf16/fp32 load into the quantized model unchanged), and the
inference-only guard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.models import DiT_models
from fast_dit_tpu.models.layers import QuantDenseGeneral
from fast_dit_tpu.ops.quant import int8_matmul, quantize_cols, quantize_rows


def test_quantize_roundtrip_bounds():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 128)) * 3.0
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    deq = q.astype(jnp.float32) * s
    # symmetric absmax: error bounded by half a quantization step per row
    step = np.asarray(s)[:, 0]
    assert np.all(np.abs(np.asarray(deq - x)) <= step[:, None] * 0.5 + 1e-7)
    qc, sc = quantize_cols(x)
    deqc = qc.astype(jnp.float32) * sc
    stepc = np.asarray(sc)[0]
    assert np.all(np.abs(np.asarray(deqc - x)) <= stepc[None, :] * 0.5 + 1e-7)


def test_int8_matmul_close_to_float():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (32, 256)).astype(jnp.float32)
    w = jax.random.normal(k2, (256, 128)) * 0.05
    b = jnp.linspace(-1, 1, 128)
    got = int8_matmul(x, w, bias=b)
    want = x @ w + b
    # per-token/per-channel symmetric int8: ~1% relative error at this shape
    rel = np.linalg.norm(np.asarray(got - want)) / np.linalg.norm(np.asarray(want))
    assert rel < 0.01, rel


def test_int8_matmul_multidim_and_dtype():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 96)).astype(jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(3), (96, 32))
    out = int8_matmul(x, w)
    assert out.shape == (2, 7, 32)
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("features,axis,shape", [
    ((3, 4, 8), (-1,), (2, 5, 32)),   # qkv-style
    (32, (-2, -1), (2, 5, 4, 8)),     # proj-style
    (64, (-1,), (2, 5, 32)),          # plain Dense-style
])
def test_quant_dense_param_tree_matches_flax(features, axis, shape):
    from flax import linen as nn

    x = jnp.zeros(shape)
    # same explicit init the model passes (defaults differ: flax DenseGeneral
    # uses lecun_normal; the DiT layers always pass xavier_uniform)
    init = nn.initializers.xavier_uniform()
    qmod = QuantDenseGeneral(features=features, axis=axis, kernel_init=init)
    fmod = nn.DenseGeneral(features=features, axis=axis, kernel_init=init)
    qp = qmod.init(jax.random.PRNGKey(0), x)
    fp = fmod.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(qp) == jax.tree_util.tree_structure(fp)
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (pa, a), (pb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(qp), key=key),
            sorted(jax.tree_util.tree_leaves_with_path(fp), key=key)):
        assert a.shape == b.shape and a.dtype == b.dtype, (pa, pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _init_dit(quant):
    model = DiT_models["DiT-S/2"](input_size=16, attn_backend="einsum",
                                  dtype=jnp.bfloat16, quant=quant)
    x = jnp.zeros((2, 4, 16, 16))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, y)
    return model, params


def test_dit_param_tree_identical_with_quant():
    """The critical checkpoint-compatibility contract: a bf16-trained param
    tree loads into the quantized model with zero remapping."""
    _, p_quant = _init_dit("w8a8")
    _, p_float = _init_dit(None)
    assert (jax.tree_util.tree_structure(p_quant)
            == jax.tree_util.tree_structure(p_float))
    for a, b in zip(jax.tree_util.tree_leaves(p_quant),
                    jax.tree_util.tree_leaves(p_float)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_dit_quant_forward_close_to_float():
    model_q, params = _init_dit("w8a8")
    model_f, _ = _init_dit(None)
    # perturb: zero-init adaLN gates make the default output trivially equal
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [p + 0.02 * jax.random.normal(k, p.shape, jnp.float32).astype(p.dtype)
                  for p, k in zip(leaves, keys)])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.array([10, 500], jnp.int32)
    y = jnp.array([3, 999], jnp.int32)
    out_q = model_q.apply(params, x, t, y)
    out_f = model_f.apply(params, x, t, y)
    rel = (np.linalg.norm(np.asarray(out_q - out_f))
           / np.linalg.norm(np.asarray(out_f)))
    assert rel < 0.05, rel   # W8A8 drift stays small through 12 blocks
    assert not np.allclose(np.asarray(out_q), np.asarray(out_f))  # actually quantized


def test_dit_quant_cfg_and_cache_paths():
    model, params = _init_dit("w8a8")
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 4, 16, 16))
    t = jnp.zeros((4,), jnp.int32)
    y = jnp.array([1, 2, 1000, 1000], jnp.int32)
    out = model.apply(params, x, t, y, method=model.forward_with_cfg,
                      cfg_scale=2.0)
    assert out.shape == (4, 8, 16, 16)
    out2, cache = model.apply(params, x, t, y, want_cache=True)
    out3 = model.apply(params, x, t, y, cache=cache)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out3),
                               rtol=2e-2, atol=2e-2)


def test_quant_is_inference_only():
    model, params = _init_dit("w8a8")
    x = jnp.zeros((2, 4, 16, 16))
    t = jnp.zeros((2,), jnp.int32)
    y = jnp.zeros((2,), jnp.int32)
    with pytest.raises(AssertionError, match="inference-only"):
        model.apply(params, x, t, y, train=True,
                    rngs={"label_drop": jax.random.PRNGKey(0)})


def test_unknown_quant_mode_rejected():
    model = DiT_models["DiT-S/2"](input_size=16, quant="w4a4")
    x = jnp.zeros((1, 4, 16, 16))
    with pytest.raises(AssertionError, match="not in"):
        model.init({"params": jax.random.PRNGKey(0)}, x,
                   jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
