"""PipeFusion: patch-level pipeline parallelism for DiT *inference*.

The reference's only distribution strategy is data parallelism over whole
images (SURVEY.md §2.3); its latency floor for ONE sample is a full forward
on one device. PipeFusion (arXiv:2405.14430) splits the token sequence into
patch chunks and pipelines them through layer stages, exploiting diffusion's
input temporal redundancy: a chunk's attention uses *fresh* K/V for chunks
already processed this step and *stale* K/V (from the previous diffusion
step) for the rest. Per pipeline tick only one chunk's activations
(B, N/M, D) cross a stage boundary — O(N/M) point-to-point traffic instead
of tensor parallelism's per-layer all-reduce over the full sequence.

TPU-native redesign (vs the paper's NCCL async-P2P implementation):

- One `shard_map` SPMD program over a 'pipe' mesh axis: every stage runs the
  same `lax.fori_loop` schedule; activations rotate with `lax.ppermute`
  (ICI neighbor traffic), bubbles are masked, and the whole diffusion step
  — including the collectives — is a single XLA program.
- The per-layer K/V caches are loop-carried state, sharded over the layer
  axis with the same PartitionSpec as the stacked block parameters: each
  stage's caches live on that stage, are updated in place
  (`lax.dynamic_update_slice` at the chunk offset) and never move.
- The stacked-parameter `nn.scan` layout of `models/dit.py` maps 1:1 onto
  stage shards, exactly as in `parallel/pipeline.py` (GPipe, the training
  counterpart of this module).

Semantics: `num_chunks=1` is EXACT (every position's K/V is rewritten before
use — pinned against `model.apply` in tests/test_pipefusion.py). For
`num_chunks>1` the result is approximate with staleness bounded by one
diffusion step, so `pipefusion_sample_loop` runs `warmup` exact steps first
(the paper's warmup) and the cache-consistency test pins the schedule: a
chunked forward after an identical exact forward reproduces the exact output
to float tolerance, i.e. the ONLY approximation is one-step-old K/V.

Like the FORA layer cache (diffusion/sampling.py cached loops) this is an
approximate fast path and is opt-in, never a silent default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..diffusion import gaussian
from ..diffusion.schedule import DiffusionSchedule
from ..models.layers import modulate
from ..models.pos_embed import get_2d_sincos_pos_embed

__all__ = ["init_kv_cache", "pipefusion_forward", "pipefusion_sample_loop"]


def init_kv_cache(model, batch: int, dtype=None):
    """Zero K/V cache: (depth, 2, B, N, H, head_dim), layer-sharded over the
    'pipe' axis inside `pipefusion_forward`. Must be (re)built per sampling
    run; zeros are only ever read if the first step is chunked (don't —
    `pipefusion_sample_loop` always warms up exactly)."""
    H = model.num_heads
    hd = model.hidden_size // H
    dtype = model.dtype if dtype is None else dtype
    return jnp.zeros((model.depth, 2, batch, model.num_patches, H, hd), dtype)


def _block_chunk_step(lp, x, c, kv_l, start, *, hidden_size, num_heads, dtype):
    """One DiT block applied to a token chunk with fresh-chunk + stale-rest
    attention.

    Numerically the same ops as `models/layers.py:DiTBlock.full_step`
    restricted to a chunk: the flax modules are re-instantiated over the
    block's own param subtree (the `parallel/pipeline.py`/
    `dit_pipeline_forward` pattern), and attention is the XLA backend
    (`ops/attention.py` "xla") with the chunk as queries and the full
    cached sequence as keys/values.

    lp: one layer's params; x: (B, n, D) chunk; c: (B, D) conditioning;
    kv_l: (2, B, N, H, hd) this layer's cache; start: chunk token offset.
    Returns (new_x, new_kv_l).
    """
    D, H = hidden_size, num_heads
    hd = D // H
    ln = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False,
                      dtype=dtype)
    mod = nn.Dense(6 * D, dtype=dtype).apply(
        {"params": lp["adaLN_modulation"]}, nn.silu(c))
    (shift_msa, scale_msa, gate_msa,
     shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

    h = modulate(ln.apply({}, x), shift_msa, scale_msa)
    qkv = nn.DenseGeneral(features=(3, H, hd), dtype=dtype).apply(
        {"params": lp["attn"]["qkv"]}, h)               # (B, n, 3, H, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    kv_l = lax.dynamic_update_slice(
        kv_l, jnp.stack([k, v]).astype(kv_l.dtype), (0, 0, start, 0, 0))
    attn = jax.nn.dot_product_attention(q, kv_l[0], kv_l[1])
    attn = nn.DenseGeneral(features=D, axis=(-2, -1), dtype=dtype).apply(
        {"params": lp["attn"]["proj"]}, attn)
    x = x + gate_msa[:, None, :] * attn

    h2 = modulate(ln.apply({}, x), shift_mlp, scale_mlp)
    h2 = nn.Dense(4 * D, dtype=dtype).apply({"params": lp["mlp"]["fc1"]}, h2)
    h2 = nn.gelu(h2, approximate=True)
    h2 = nn.Dense(D, dtype=dtype).apply({"params": lp["mlp"]["fc2"]}, h2)
    x = x + gate_mlp[:, None, :] * h2
    return x, kv_l


def pipefusion_forward(model, variables, x, t, y, kv, *, mesh: Mesh,
                       num_chunks: int, axis: str = "pipe"):
    """Full DiT forward with patch chunks pipelined over `axis`.

    Same contract as `model.apply(variables, x, t, y)` (inference path, no
    label dropout) plus the K/V cache thread: pass the previous step's `kv`
    (or `init_kv_cache(...)`), get `(out, new_kv)` back. `num_chunks=1` is
    exact; `num_chunks>1` attends to one-step-stale K/V for not-yet-updated
    chunks (see module docstring). mlp_ratio=4 only (every registry config).
    """
    assert model.mlp_ratio == 4.0, "pipefusion supports mlp_ratio=4 configs"
    assert getattr(model, "moe_experts", 0) == 0, (
        "pipefusion rebuilds the dense block MLP (fc1/fc2); MoE models "
        "(models/moe.py wi/wo expert stacks) are not supported here")
    p = variables["params"]
    n_stages = mesh.shape[axis]
    assert model.depth % n_stages == 0, (model.depth, n_stages)
    dtype = model.dtype

    # --- replicated embedders (identical to parallel/pipeline.py) ---
    from ..models.layers import (FinalLayer, LabelEmbedder, PatchEmbed,
                                 TimestepEmbedder)

    tokens = PatchEmbed(model.patch_size, model.hidden_size, dtype=dtype
                        ).apply({"params": p["x_embedder"]}, x)
    pos = get_2d_sincos_pos_embed(
        model.hidden_size, model.input_size // model.patch_size)
    tokens = tokens + jnp.asarray(pos, tokens.dtype)[None]
    t_emb = TimestepEmbedder(model.hidden_size, dtype=dtype).apply(
        {"params": p["t_embedder"]}, t)
    y_emb = LabelEmbedder(model.num_classes, model.hidden_size,
                          model.class_dropout_prob).apply(
        {"params": p["y_embedder"]}, y, False)
    c = t_emb + y_emb.astype(t_emb.dtype)

    B, N, D = tokens.shape
    M = num_chunks
    assert N % M == 0, (N, M)
    n = N // M
    chunks = tokens.reshape(B, M, n, D).swapaxes(0, 1)   # (M, B, n, D)
    stacked = p["blocks"]["block"]

    def per_stage(local_params, kv_local, chunks, c):
        s = lax.axis_index(axis)
        fwd = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def tick(tk, carry):
            act, kv_loc, out = carry
            # stage 0 injects chunk tk while tk < M (clipped gather keeps
            # shapes static)
            inj = jnp.clip(tk, 0, M - 1)
            act = jnp.where((s == 0) & (tk < M), chunks[inj], act)
            # stage s holds chunk tk-s only while 0 <= tk-s < M (else bubble)
            ci = jnp.clip(tk - s, 0, M - 1)
            start = ci * n

            def layer(xc, inputs):
                lp, kv_l = inputs
                xc, kv_l = _block_chunk_step(
                    lp, xc, c, kv_l, start, hidden_size=model.hidden_size,
                    num_heads=model.num_heads, dtype=dtype)
                return xc, kv_l

            new_act, new_kv = lax.scan(layer, act, (local_params, kv_local))
            live = (tk >= s) & (tk - s < M)
            act = jnp.where(live, new_act, act)
            kv_loc = jnp.where(live, new_kv, kv_loc)
            # last stage banks its finished chunk
            out = jnp.where((s == n_stages - 1) & live,
                            out.at[ci].set(act), out)
            act = lax.ppermute(act, axis, fwd)
            return act, kv_loc, out

        init = (jnp.zeros_like(chunks[0]), kv_local, jnp.zeros_like(chunks))
        _, kv_loc, out = lax.fori_loop(0, M + n_stages - 1, tick, init)
        # out is populated only on the last stage; psum replicates it
        return lax.psum(out, axis), kv_loc

    layer_spec = jax.tree.map(lambda _: P(axis), stacked)
    out_chunks, new_kv = shard_map(
        per_stage, mesh=mesh,
        in_specs=(layer_spec, P(axis), P(), P()),
        out_specs=(P(), P(axis)),
        check_vma=False,
    )(stacked, kv, chunks, c)

    tokens = out_chunks.swapaxes(0, 1).reshape(B, N, D)
    out = FinalLayer(model.hidden_size, model.patch_size, model.out_channels,
                     dtype=dtype).apply({"params": p["final_layer"]}, tokens, c)
    return model.unpatchify(out).astype(jnp.float32), new_kv


def pipefusion_sample_loop(model, variables, shape, sched: DiffusionSchedule,
                           y, *, mesh: Mesh, num_chunks: int,
                           warmup: int = 1, kind: str = "ddim",
                           rng=None, noise=None, eta: float = 0.0,
                           clip_denoised: bool = True, axis: str = "pipe",
                           cfg_scale: float | None = None,
                           guidance_channels: int = 3):
    """Reverse-process sampling with the patch-pipelined forward.

    Mirrors `diffusion/sampling.py:_loop` (same timestep-map gather, same
    bulk per-step noise keys, same p/ddim updates) with the K/V cache as
    loop state: the first `warmup` steps run exact (`num_chunks=1`) to fill
    the caches, the rest run chunked. `warmup >= sched.num_timesteps` (or
    `num_chunks=1`) degenerates to the exact sampler — pinned against
    `ddim_sample_loop` in tests.

    `cfg_scale` enables classifier-free guidance with `forward_with_cfg`'s
    exact doubled-batch contract (models/dit.py:194-216, reference
    models_original.py:250-266 incl. the `guidance_channels` quirk): the
    pipelined forward runs on [cond ; uncond] (the K/V cache covers both
    halves), the mixed eps drives a single-width sampler update. `y` stays
    the (B,) conditional labels; the null class is appended internally.
    """
    assert kind in ("p", "ddim"), kind
    if noise is not None:
        shape = noise.shape
    T = sched.num_timesteps
    warmup = min(max(warmup, 1), T)  # step 0 must be exact (cold cache)
    B = shape[0]
    if noise is None:
        if rng is None:
            raise ValueError("either `noise` or `rng` must be provided")
        noise = jax.random.normal(jax.random.fold_in(rng, 2 ** 30), shape)
    x = jnp.asarray(noise, jnp.float32)
    use_cfg = cfg_scale is not None and cfg_scale != 1.0
    if use_cfg:
        y = jnp.concatenate([y, jnp.full((B,), model.num_classes, y.dtype)])
    kv = init_kv_cache(model, 2 * B if use_cfg else B)

    idx = jnp.arange(T - 1, -1, -1)
    needs_noise = kind == "p" or eta != 0.0
    if needs_noise:
        if rng is None:
            raise ValueError("stochastic sampling needs `rng`")
        step_noise = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(rng, i), shape, jnp.float32))(idx)
    else:
        step_noise = jnp.zeros((T, 1))  # unused placeholder

    def body(chunks_this_segment):
        def step(carry, scan_in):
            xc, kvc = carry
            k, i = scan_in
            t = jnp.full((B,), i, jnp.int32)
            if use_cfg:
                # forward_with_cfg contract: doubled batch, channel-sliced mix
                combined = jnp.concatenate([xc, xc])
                t2 = jnp.concatenate([t, t])
                full, kvc = pipefusion_forward(
                    model, variables, combined, sched.timestep_map[t2], y,
                    kvc, mesh=mesh, num_chunks=chunks_this_segment, axis=axis)
                eps = full[:, :guidance_channels]
                rest = full[:B, guidance_channels:]
                cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
                half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
                out = jnp.concatenate([half_eps, rest], axis=1)
            else:
                out, kvc = pipefusion_forward(
                    model, variables, xc, sched.timestep_map[t], y, kvc,
                    mesh=mesh, num_chunks=chunks_this_segment, axis=axis)
            nse = step_noise[k] if needs_noise else None
            if kind == "p":
                res = gaussian.p_sample_step(
                    sched, out, xc, t, nse, clip_denoised=clip_denoised)
            else:
                res = gaussian.ddim_step(
                    sched, out, xc, t, nse, eta=eta,
                    clip_denoised=clip_denoised)
            return (res.sample, kvc), None

        return step

    ks = jnp.arange(T)
    (x, kv), _ = lax.scan(body(1), (x, kv), (ks[:warmup], idx[:warmup]))
    if warmup < T and num_chunks > 1:
        (x, kv), _ = lax.scan(body(num_chunks), (x, kv),
                              (ks[warmup:], idx[warmup:]))
    elif warmup < T:
        (x, kv), _ = lax.scan(body(1), (x, kv), (ks[warmup:], idx[warmup:]))
    return x
