"""Pipeline parallelism over the stacked block axis: equivalence proofs on
the CPU mesh (SURVEY.md §2.3 — beyond the reference's DP-only story)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.models import DiT
from fast_dit_tpu.parallel import (create_pipeline_mesh, dit_pipeline_forward,
                                   pipeline_apply)


def tiny_dit(depth=8, **kw):
    return DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
               depth=depth, num_heads=4, num_classes=10,
               attn_backend="einsum", **kw)


def init_params(model, B=4):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 8, 8))
    t = jnp.arange(B) % 10
    y = jnp.arange(B) % 10
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, y)
    # non-trivial weights (zero-init adaLN would hide block mistakes)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape) * 0.05,
        params)
    return params, x, t, y


def test_pipeline_apply_matches_scan():
    """pipeline_apply over a toy stacked linear block == sequential apply."""
    mesh = create_pipeline_mesh(4)
    L, B, N, D = 8, 6, 4, 16
    ws = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.2
    x = jax.random.normal(jax.random.PRNGKey(1), (B, N, D))
    c = jax.random.normal(jax.random.PRNGKey(2), (B, D))

    block_fn = lambda w, xs, cs: jnp.tanh(xs @ w + cs[:, None, :])
    got = pipeline_apply(block_fn, ws, x, c, mesh=mesh, num_microbatches=3)

    want = x
    for i in range(L):
        want = block_fn(ws[i], want, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("n_stages,microbatches", [(2, 2), (4, 4), (8, 2)])
def test_dit_pipeline_forward_equivalence(n_stages, microbatches):
    """Pipelined DiT forward == the plain nn.scan forward, for stage counts
    that divide depth and several microbatch settings."""
    model = tiny_dit(depth=8)
    params, x, t, y = init_params(model, B=4)
    want = model.apply(params, x, t, y)

    mesh = create_pipeline_mesh(n_stages)
    got = dit_pipeline_forward(model, params, x, t, y, mesh=mesh,
                               num_microbatches=microbatches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_gradients_match():
    """The pipeline is one differentiable XLA program: grads through the
    stage collectives equal grads through the sequential stack."""
    model = tiny_dit(depth=4)
    params, x, t, y = init_params(model, B=4)
    mesh = create_pipeline_mesh(4)

    def loss_pipe(p):
        return jnp.sum(dit_pipeline_forward(
            model, p, x, t, y, mesh=mesh, num_microbatches=2) ** 2)

    def loss_ref(p):
        return jnp.sum(model.apply(p, x, t, y) ** 2)

    ga = jax.grad(loss_pipe)(params)
    gb = jax.grad(loss_ref)(params)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_jit_with_sharded_params():
    """Under jit with the layer axis actually sharded over the mesh, the
    pipeline compiles and matches (the production placement)."""
    model = tiny_dit(depth=8)
    params, x, t, y = init_params(model, B=8)
    mesh = create_pipeline_mesh(4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    # place the stacked block params stage-sharded, everything else replicated
    def placed(path, leaf):
        s = "/".join(str(getattr(k, "key", k)) for k in path)
        spec = P("pipe") if "blocks/block" in s else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    params = jax.tree_util.tree_map_with_path(placed, params)
    fn = jax.jit(lambda p, x, t, y: dit_pipeline_forward(
        model, p, x, t, y, mesh=mesh, num_microbatches=4))
    got = fn(params, x, t, y)
    want = model.apply(jax.device_get(params), x, t, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
