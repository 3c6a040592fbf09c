"""Sequence (context) parallelism: one sample's tokens span chips.

The reference cannot do this at all — its distribution story is pure batch
data-parallelism (`/root/reference/train_options/train_baseline.py:117-124`),
which cannot reduce per-sample latency or per-chip activation memory. Here
the DiT block stack runs under `shard_map` with the TOKEN axis sharded over
a 'seq' mesh axis: LayerNorm / adaLN modulation / MLP / projections are all
per-token (embarrassingly parallel), so the ONLY communication in the whole
stack is inside attention — exact ring attention (`ops/ring_attention.py`),
whose k/v rotation rides neighbor ICI links.

Composes with data parallelism (a ('data', 'seq') mesh shards batch and
tokens simultaneously) and is differentiable end to end (ppermute and scan
transpose cleanly), so the same program serves sequence-parallel training —
the regime that matters at 512²/1024² latents where one sample's activations
(and the quadratic attention work) outgrow a single chip.

Equivalence to the unsharded forward is pinned in tests/test_sequence.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["create_seq_mesh", "sequence_parallel_stack", "dit_sequence_parallel_forward"]


def create_seq_mesh(seq: int, data: int = 1, devices=None) -> Mesh:
    """Mesh over ('data', 'seq') — 'seq' innermost so the ring rides the
    fastest ICI links."""
    import numpy as np

    devices = list(jax.devices()) if devices is None else list(devices)
    n = data * seq
    assert len(devices) >= n, (len(devices), n)
    return Mesh(np.array(devices[:n]).reshape(data, seq), ("data", "seq"))


def sequence_parallel_stack(block_fn, stacked_params, x, c, *, mesh: Mesh,
                            seq_axis: str = "seq", data_axis: str = "data"):
    """Run the stacked DiT blocks with tokens sharded over `seq_axis`.

    block_fn: (layer_params, x_local, c) -> x_local, one DiT block whose
        attention backend is `f"ring:{seq_axis}"` (the only op in the block
        that sees the global sequence).
    stacked_params: pytree with a leading layer axis (the nn.scan layout),
        replicated.
    x: (B, N, D) tokens, N divisible by the seq-axis size; c: (B, D).

    Returns (B, N, D), numerically equal to applying the blocks unsharded.
    """
    has_data = data_axis in mesh.shape and mesh.shape[data_axis] > 1
    batch = data_axis if has_data else None

    def shard_body(params, xs, cs):
        def body(carry, layer_params):
            return block_fn(layer_params, carry, cs), None

        out, _ = lax.scan(body, xs, params)
        return out

    return shard_map(
        shard_body, mesh=mesh,
        in_specs=(P(), P(batch, seq_axis), P(batch)),
        out_specs=P(batch, seq_axis),
        check_vma=False,
    )(stacked_params, x, c)


def dit_sequence_parallel_forward(model, variables, x, t, y, *, mesh: Mesh,
                                  seq_axis: str = "seq",
                                  data_axis: str = "data"):
    """Full DiT forward with tokens sharded over `seq_axis`.

    Same contract as `model.apply(variables, x, t, y)` (inference path, no
    label dropout) for EXACT models only: the blocks are rebuilt with the
    ring backend, and approximations that change per-block token counts or
    projection dtypes (ToMe, int8 quant) do not compose with a sharded
    token axis — rejected here rather than silently dropped.
    """
    from ..models.layers import (DiTBlock, FinalLayer, LabelEmbedder,
                                 PatchEmbed, TimestepEmbedder)
    from ..models.pos_embed import get_2d_sincos_pos_embed

    assert (not model.quant and model.tome_ratio == 0
            and getattr(model, "moe_experts", 0) == 0), (
        "sequence parallelism is exact-only dense-DiT: quant/tome/moe "
        f"(quant={model.quant!r}, tome_ratio={model.tome_ratio}, "
        f"moe_experts={getattr(model, 'moe_experts', 0)}) are not "
        "supported by the token-sharded block stack")

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

    block = DiTBlock(model.hidden_size, model.num_heads,
                     mlp_ratio=model.mlp_ratio, dtype=model.dtype,
                     attn_backend=f"ring:{seq_axis}")
    tokens = sequence_parallel_stack(
        lambda lp, xs, cs: block.apply({"params": lp}, xs, cs),
        p["blocks"]["block"], tokens, c,
        mesh=mesh, seq_axis=seq_axis, data_axis=data_axis)
    out = FinalLayer(model.hidden_size, model.patch_size, model.out_channels,
                     dtype=model.dtype).apply(
        {"params": p["final_layer"]}, tokens, c)
    return model.unpatchify(out).astype(jnp.float32)
