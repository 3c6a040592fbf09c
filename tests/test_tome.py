"""Token merging (ops/tome.py): matching semantics and DiT integration.

Proof structure:
1. merge/unmerge index machinery is exact where exactness is possible:
   duplicate-token inputs round-trip losslessly, merged rows are true means,
   merge(unmerge(y)) == y, kept tokens pass through untouched.
2. tome_ratio=0 is bit-identical to the baseline model; the param tree is
   unchanged at any ratio (checkpoint compatibility).
3. tome_ratio>0 stays near the exact output on a real forward and actually
   diverges from it (the approximate path really ran), and composes with
   the FORA layer cache and CFG.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.models import DiT
from fast_dit_tpu.ops.tome import bipartite_soft_matching_2d, tome_merge_count


def grid_input(B=2, gh=8, D=16, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.randn(B, gh * gh, D), jnp.float32)


def test_merge_count_clip():
    assert tome_merge_count(256, 0.0) == 0
    assert tome_merge_count(256, 0.5) == 128
    # 2x2 dst grid keeps 64 of 256 tokens -> at most 192 mergeable
    assert tome_merge_count(256, 0.9) == 192
    assert tome_merge_count(256, 1.0) == 192


def test_duplicate_tokens_roundtrip_lossless():
    """Each 2x2 cell constant => sources identical to their dst => merging
    is exact and unmerge restores the input bit-tight."""
    B, gh, D = 2, 8, 16
    rng = np.random.RandomState(1)
    cell = rng.randn(B, gh // 2, gh // 2, D)
    x = jnp.asarray(
        np.repeat(np.repeat(cell, 2, axis=1), 2, axis=2).reshape(B, gh * gh, D),
        jnp.float32)
    r = tome_merge_count(gh * gh, 0.5)
    m, u = bipartite_soft_matching_2d(x, r)
    np.testing.assert_allclose(np.asarray(u(m(x))), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def test_merge_rows_are_means_and_kept_pass_through():
    x = grid_input()
    N = x.shape[1]
    r = tome_merge_count(N, 0.5)
    m, u = bipartite_soft_matching_2d(x, r)
    y = m(x)
    assert y.shape == (x.shape[0], N - r, x.shape[2])
    # unmerge assigns every original token its representative's row; group
    # means: re-merging the unmerged array must reproduce y (mean of equal
    # rows), i.e. merge is a projection onto its own range
    np.testing.assert_allclose(np.asarray(m(u(y))), np.asarray(y),
                               rtol=1e-5, atol=1e-6)
    # tokens whose representative is themselves come back exactly
    x2 = u(y)
    diff = np.abs(np.asarray(x2 - x)).max(axis=-1)
    changed = (diff > 1e-6).sum()
    assert changed <= 2 * r * x.shape[0], (changed, r)
    assert changed > 0


def test_merge_all_sources_branch():
    """r == n_src exercises the rank-free fast path."""
    x = grid_input(gh=8)
    r = tome_merge_count(64, 1.0)  # 48 = every source token
    m, u = bipartite_soft_matching_2d(x, r)
    assert m(x).shape[1] == 16
    assert u(m(x)).shape == x.shape


def test_tied_tokens_keep_bijection():
    """Exactly-equal tokens produce tied scores; the index tie-break must
    keep every kept slot uniquely assigned (no NaNs from empty slots)."""
    x = jnp.ones((2, 64, 8), jnp.float32)  # all tokens identical
    r = tome_merge_count(64, 0.5)
    m, u = bipartite_soft_matching_2d(x, r)
    y = m(x)
    assert bool(jnp.isfinite(y).all())
    np.testing.assert_allclose(np.asarray(u(y)), np.asarray(x),
                               rtol=1e-5, atol=1e-6)


def tiny_dit(**kw):
    return DiT(input_size=16, patch_size=2, in_channels=4, hidden_size=32,
               depth=4, num_heads=4, num_classes=10, attn_backend="xla", **kw)


def init_all(seed=2):
    model = tiny_dit()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 16, 16))
    t = jnp.array([5, 9])
    y = jnp.array([1, 2])
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, y)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(seed), p.shape) * 0.05,
        params)
    return params, x, t, y


def test_ratio_zero_is_bit_identical():
    params, x, t, y = init_all()
    want = tiny_dit().apply(params, x, t, y)
    got = tiny_dit(tome_ratio=0.0).apply(params, x, t, y)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_param_tree_unchanged():
    """ToMe adds no parameters: any checkpoint loads unchanged."""
    params, x, t, y = init_all()
    p1 = tiny_dit(tome_ratio=0.5).init({"params": jax.random.PRNGKey(1)},
                                       x, t, y)
    assert jax.tree.structure(params) == jax.tree.structure(p1)
    assert [np.shape(l) for l in jax.tree.leaves(params)] == \
           [np.shape(l) for l in jax.tree.leaves(p1)]


@pytest.mark.parametrize("ratio", [0.25, 0.5, 0.75])
def test_merged_forward_close_but_not_identical(ratio):
    params, x, t, y = init_all()
    want = tiny_dit().apply(params, x, t, y)
    got = tiny_dit(tome_ratio=ratio).apply(params, x, t, y)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert 0.0 < rel < 0.25, f"ratio {ratio}: drift {rel:.4f}"


def test_tome_mlp_mode():
    """`tome_mlp=True` (the ToMe-SD-rejected mode, kept as a measured
    option) runs, differs from attention-only merging, and stays bounded."""
    params, x, t, y = init_all()
    want = tiny_dit().apply(params, x, t, y)
    attn_only = tiny_dit(tome_ratio=0.5).apply(params, x, t, y)
    both = tiny_dit(tome_ratio=0.5, tome_mlp=True).apply(params, x, t, y)
    assert float(jnp.abs(both - attn_only).max()) > 0
    rel = float(jnp.linalg.norm(both - want) / jnp.linalg.norm(want))
    assert 0.0 < rel < 0.5


def test_composes_with_layer_cache():
    """want_cache/cache (FORA) must thread through the merged blocks: the
    cache stores full-length unmerged branch outputs."""
    params, x, t, y = init_all()
    model = tiny_dit(tome_ratio=0.5)
    out, cache = model.apply(params, x, t, y, want_cache=True)
    replay = model.apply(params, x, t, y, cache=cache)
    np.testing.assert_allclose(np.asarray(replay), np.asarray(out),
                               rtol=2e-5, atol=2e-5)
    attn_outs, mlp_outs = cache
    assert attn_outs.shape[2] == model.num_patches  # full length, not merged


def test_cfg_and_jit():
    params, x, t, y = init_all()
    model = tiny_dit(tome_ratio=0.5)
    yy = jnp.concatenate([y, jnp.full_like(y, 10)])
    xx = jnp.concatenate([x, x])
    tt = jnp.concatenate([t, t])
    out = jax.jit(lambda: model.apply(params, xx, tt, yy,
                                      method=model.forward_with_cfg,
                                      cfg_scale=2.0))()
    assert out.shape == (4, 8, 16, 16)
    assert bool(jnp.isfinite(out).all())


def test_train_rejected():
    params, x, t, y = init_all()
    model = tiny_dit(tome_ratio=0.5)
    with pytest.raises(AssertionError, match="inference-only"):
        model.apply(params, x, t, y, train=True,
                    rngs={"label_drop": jax.random.PRNGKey(0)})
