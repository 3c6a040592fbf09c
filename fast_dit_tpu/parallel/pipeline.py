"""Pipeline parallelism over the stacked DiT block axis.

The reference's only distribution strategy is data parallelism (SURVEY.md
§2.3 "NOT present: ... pipeline parallelism"); this is TPU headroom beyond
parity. The DiT block stack already runs as one `nn.scan` with parameters
stacked on a leading "layers" axis (`models/dit.py`), which is exactly the
layout pipeline parallelism wants: shard that axis over a 'pipe' mesh axis so
each device holds `depth / n_stages` contiguous blocks, split the batch into
microbatches, and rotate activations stage-to-stage with `lax.ppermute`
(GPipe schedule, bubble fraction (P-1)/(M+P-1)).

Everything runs SPMD under `shard_map`: every stage executes the same
program each tick; stages whose slot holds no live microbatch compute into a
mask (the bubble). The whole pipeline — including the collectives — is one
XLA program, and it is differentiable (ppermute transposes to the reverse
permutation), so the same function serves training.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["create_pipeline_mesh", "pipeline_apply", "dit_pipeline_forward"]


def create_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D mesh over ('pipe',)."""
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    assert len(devices) >= n_stages
    return Mesh(np.array(devices[:n_stages]), ("pipe",))


def pipeline_apply(block_fn, stacked_params, x, c, *, mesh: Mesh,
                   num_microbatches: int, axis: str = "pipe"):
    """Run the stacked block sequence as a GPipe pipeline over `axis`.

    block_fn: (layer_params, x, c) -> x, one DiT block.
    stacked_params: pytree with a leading layer axis (the nn.scan layout),
        sharded (or shardable) over `axis`.
    x: (B, N, D) tokens; c: (B, D) conditioning. B must divide by
        `num_microbatches`; depth must divide by the stage count.

    Returns (B, N, D), numerically identical to sequentially applying all
    layers (see tests/test_pipeline.py equivalence proof).
    """
    n_stages = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % n_stages == 0, (depth, n_stages)
    B = x.shape[0]
    M = num_microbatches
    assert B % M == 0, (B, M)
    mb = B // M

    mb_x = x.reshape(M, mb, *x.shape[1:])
    mb_c = c.reshape(M, mb, *c.shape[1:])

    def stage(local_params, act):
        """Apply this stage's contiguous blocks (a lax.scan over them)."""
        def body(carry, layer_params):
            xs, cs = carry
            return (block_fn(layer_params, xs, cs), cs), None

        (xs, cs), _ = lax.scan(body, act, local_params)
        return xs, cs

    def per_stage(local_params, mb_x, mb_c):
        s = lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(t, carry):
            act_x, act_c, out = carry
            # stage 0 injects microbatch t (clipped gather keeps shapes static)
            inj = jnp.clip(t, 0, M - 1)
            take = (s == 0) & (t < M)
            act_x = jnp.where(take, mb_x[inj], act_x)
            act_c = jnp.where(take, mb_c[inj], act_c)
            new_x, new_c = stage(local_params, (act_x, act_c))
            # bubble mask: stage s holds microbatch t-s only while 0 <= t-s < M
            live = (t >= s) & (t - s < M)
            new_x = jnp.where(live, new_x, act_x)
            # last stage banks its finished microbatch
            done = jnp.clip(t - (n_stages - 1), 0, M - 1)
            out = jnp.where((s == n_stages - 1) & live,
                            out.at[done].set(new_x), out)
            # rotate activations to the next stage
            act_x = lax.ppermute(new_x, axis, fwd)
            act_c = lax.ppermute(new_c, axis, fwd)
            return act_x, act_c, out

        init = (jnp.zeros_like(mb_x[0]), jnp.zeros_like(mb_c[0]),
                jnp.zeros_like(mb_x))
        _, _, out = lax.fori_loop(0, M + n_stages - 1, tick, init)
        # `out` is populated only on the last stage (zeros elsewhere):
        # summing over the axis replicates it everywhere
        return lax.psum(out, axis)

    layer_spec = jax.tree.map(lambda _: P(axis), stacked_params)
    out = shard_map(
        per_stage, mesh=mesh,
        in_specs=(layer_spec, P(), P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, mb_x, mb_c)
    return out.reshape(B, *x.shape[1:])


def dit_pipeline_forward(model, variables, x, t, y, *, mesh: Mesh,
                         num_microbatches: int, axis: str = "pipe"):
    """Full DiT forward with the block stack pipelined over `axis`.

    Same contract as `model.apply(variables, x, t, y)` (inference path, no
    label dropout); embedders / final layer run replicated, the `depth`
    blocks run stage-sharded. The stacked-parameter nn.scan layout of
    `models/dit.py` maps 1:1 onto the stage shards — no re-packing.
    """
    from ..models.layers import (DiTBlock, FinalLayer, LabelEmbedder,
                                 PatchEmbed, TimestepEmbedder)
    from ..models.pos_embed import get_2d_sincos_pos_embed

    p = variables["params"]
    tokens = PatchEmbed(model.patch_size, model.hidden_size,
                        dtype=model.dtype).apply({"params": p["x_embedder"]}, x)
    pos = get_2d_sincos_pos_embed(
        model.hidden_size, model.input_size // model.patch_size)
    tokens = tokens + jnp.asarray(pos, tokens.dtype)[None]
    t_emb = TimestepEmbedder(model.hidden_size, dtype=model.dtype).apply(
        {"params": p["t_embedder"]}, t)
    y_emb = LabelEmbedder(model.num_classes, model.hidden_size,
                          model.class_dropout_prob).apply(
        {"params": p["y_embedder"]}, y, False)
    c = t_emb + y_emb.astype(t_emb.dtype)

    assert (not model.quant and model.tome_ratio == 0
            and getattr(model, "moe_experts", 0) == 0), (
        "pipeline parallelism is exact-only dense-DiT: quant/tome/moe "
        f"(quant={model.quant!r}, tome_ratio={model.tome_ratio}, "
        f"moe_experts={getattr(model, 'moe_experts', 0)}) are not "
        "supported by the stage-sharded block stack")
    block = DiTBlock(model.hidden_size, model.num_heads,
                     mlp_ratio=model.mlp_ratio, dtype=model.dtype,
                     attn_backend=model.attn_backend)
    tokens = pipeline_apply(
        lambda lp, xs, cs: block.apply({"params": lp}, xs, cs),
        p["blocks"]["block"], tokens, c,
        mesh=mesh, num_microbatches=num_microbatches, axis=axis)
    out = FinalLayer(model.hidden_size, model.patch_size, model.out_channels,
                     dtype=model.dtype).apply(
        {"params": p["final_layer"]}, tokens, c)
    return model.unpatchify(out).astype(jnp.float32)
