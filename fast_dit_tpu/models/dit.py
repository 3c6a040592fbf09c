"""The DiT backbone, TPU-first.

Capability parity with the canonical reference model
(`/root/reference/train_options/models_original.py:145-266`): patchify ->
frozen 2D sin-cos pos-embed -> depth x adaLN-Zero blocks -> FinalLayer ->
unpatchify, with `c = t_emb + y_emb`, learn_sigma channel doubling, the CFG
doubled-batch `forward_with_cfg` including its 3-channel guidance quirk
(:262), and the 12-config S/B/L/XL x patch-2/4/8 registry (:328-370).

TPU-first redesign:
- The `depth` blocks run under `flax.linen.scan` with stacked parameters —
  one compiled block body instead of `depth` inlined copies (faster compiles,
  natural remat boundary, and a clean layer axis for pipeline parallelism).
- Gradient checkpointing (ring-2 feature, reference `train_options/models.py`
  grad-ckpt fork) is `remat="full"` — a flag, not a script fork.
- Attention backend is pluggable (Pallas flash attention on TPU).
- `dtype` switches activation compute to bf16 while params stay fp32 (the
  AMP ablation, reference `train_options/train_amp.py`, as a flag).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import DiTBlock, FinalLayer, LabelEmbedder, PatchEmbed, TimestepEmbedder
from .pos_embed import get_2d_sincos_pos_embed

__all__ = ["DiT", "DiT_models", "dit_config", "dit_moe_config"]


class DiT(nn.Module):
    """Diffusion Transformer (reference models_original.py:145-248)."""

    input_size: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    class_dropout_prob: float = 0.1
    num_classes: int = 1000
    learn_sigma: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    remat: bool = False  # gradient checkpointing per block (ring-2 feature)
    # what the backward pass keeps instead of recomputing (only with remat):
    #   "nothing"  — recompute the whole block (max memory headroom)
    #   "attn"     — save per-block attention outputs (skips recomputing the
    #                softmax region, the lowest-MFU part of the block, for
    #                ~75 MB/block at XL/2 bs128 bf16)
    #   "attn_mlp" — additionally save MLP outputs (2x the saved bytes)
    remat_policy: str = "nothing"
    scan_unroll: int = 1  # lax.scan unroll factor over the block stack
    # int8 W8A8 block projections (ops/quant.py): 2x MXU throughput for
    # sampling on v5e+; inference-only (round() has zero gradient)
    quant: Optional[str] = None
    # token merging (ops/tome.py): fraction of tokens merged away inside
    # every block's attention (approximate; 0 = off, bit-exact).
    # Clipped to 0.75 (the 2x2 dst grid); composes with the FORA cache
    tome_ratio: float = 0.0
    # additionally merge the MLP branch: ~2x the saving, ~8x the drift
    # (docs/ABLATIONS.md "Token merging" section)
    tome_mlp: bool = False
    # mixture-of-experts MLPs (models/moe.py): 0 = dense canonical DiT.
    # Expert weights get a leading expert axis shardable over the mesh
    # ('expert parallelism', parallel/mesh.py _EP_RULES); routing aux
    # losses are sown into the 'losses' collection — apply with
    # mutable=["losses"] during training (train/train_lib.py does)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity: float = 1.25

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def num_patches(self) -> int:
        return (self.input_size // self.patch_size) ** 2

    def unpatchify(self, x):
        """(B, N, p*p*C_out) -> (B, C_out, H, W) (reference models_original.py:218-231)."""
        c = self.out_channels
        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        assert h * w == x.shape[1]
        x = x.reshape(x.shape[0], h, w, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(x.shape[0], c, h * p, w * p)

    @nn.compact
    def __call__(self, x, t, y, *, train: bool = False, force_drop_ids=None,
                 cache=None, want_cache: bool = False):
        """x: (B, C, H, W), t: (B,) int timesteps, y: (B,) int labels.

        Returns (B, out_channels, H, W). When `train` and class_dropout_prob
        > 0, labels are dropped to the null class using the 'label_drop' rng.

        Layer cache (FORA-style sampling acceleration, used by the cached
        sampler loops in diffusion/sampling.py):
        - `want_cache=True`: also return a (attn_outs, mlp_outs) pytree with
          a leading layer axis — the per-block branch outputs.
        - `cache=(attn_outs, mlp_outs)`: skip attention/MLP entirely and
          reuse the cached branch outputs with fresh adaLN gates (the only
          part that depends on the current timestep).
        """
        B = x.shape[0]
        if self.quant:
            from ..ops.quant import QUANT_MODES
            assert self.quant in QUANT_MODES, (
                f"quant={self.quant!r} not in {QUANT_MODES}")
            assert not train, "int8 quantization is inference-only"
        x = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype,
                       name="x_embedder")(x)
        pos = get_2d_sincos_pos_embed(
            self.hidden_size, self.input_size // self.patch_size)
        x = x + jnp.asarray(pos, dtype=x.dtype)[None]

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)
        y_emb = LabelEmbedder(self.num_classes, self.hidden_size,
                              self.class_dropout_prob, name="y_embedder")(
            y, train, force_drop_ids)
        c = (t_emb + y_emb.astype(t_emb.dtype))

        block = DiTBlock
        if self.remat:
            policies = {
                "nothing": jax.checkpoint_policies.nothing_saveable,
                "attn": jax.checkpoint_policies.save_only_these_names(
                    "attn_out"),
                "attn_mlp": jax.checkpoint_policies.save_only_these_names(
                    "attn_out", "mlp_out"),
            }
            block = nn.remat(
                DiTBlock,
                prevent_cse=False,
                policy=policies[self.remat_policy],
            )

        class BlockStack(nn.Module):
            """Scan body: carry (x, c) through `depth` stacked blocks.

            Three scanned entry points over the same stacked params:
            `__call__` (plain), `collect` (emit per-layer branch outputs as
            scan ys), `reuse` (consume them as scan xs — the cached path).
            """
            hidden_size: int
            num_heads: int
            mlp_ratio: float
            dtype: jnp.dtype
            attn_backend: str
            quant: Optional[str]
            tome_r: int
            tome_mlp: bool
            moe_experts: int
            moe_top_k: int
            moe_capacity: float

            def setup(self):
                self.block = block(self.hidden_size, self.num_heads,
                                   mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                                   attn_backend=self.attn_backend,
                                   quant=self.quant, tome_r=self.tome_r,
                                   tome_mlp=self.tome_mlp,
                                   moe_experts=self.moe_experts,
                                   moe_top_k=self.moe_top_k,
                                   moe_capacity=self.moe_capacity)

            def __call__(self, carry, _):
                xs, cs = carry
                xs = self.block(xs, cs)
                return (xs, cs), None

            def collect(self, carry, _):
                xs, cs = carry
                xs, branch_outs = self.block.full_step(xs, cs)
                return (xs, cs), branch_outs

            def reuse(self, carry, cache_l):
                xs, cs = carry
                xs = self.block.cached_step(xs, cs, *cache_l)
                return (xs, cs), None

        if self.tome_ratio > 0:
            from ..ops.tome import tome_merge_count
            assert not train, "token merging is inference-only"
            tome_r = tome_merge_count(self.num_patches, self.tome_ratio)
        else:
            tome_r = 0
        stack = nn.scan(
            BlockStack,
            # 'losses': per-layer MoE router aux losses (sown only when the
            # collection is mutable, i.e. a training apply) stack on axis 0
            variable_axes={"params": 0, "losses": 0},
            split_rngs={"params": True},
            length=self.depth,
            unroll=self.scan_unroll,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
            methods=["__call__", "collect", "reuse"],
        )(self.hidden_size, self.num_heads, self.mlp_ratio, self.dtype,
          self.attn_backend, self.quant, tome_r, self.tome_mlp,
          self.moe_experts, self.moe_top_k, self.moe_capacity,
          name="blocks")
        new_cache = None
        if cache is not None:
            (x, _), _ = stack.reuse((x, c), cache)
        elif want_cache:
            (x, _), new_cache = stack.collect((x, c), None)
        else:
            (x, _), _ = stack((x, c), None)

        x = FinalLayer(self.hidden_size, self.patch_size, self.out_channels,
                       dtype=self.dtype, name="final_layer")(x, c)
        x = self.unpatchify(x)
        x = x.astype(jnp.float32)
        if want_cache:
            return x, new_cache
        return x

    def forward_with_cfg(self, x, t, y, cfg_scale, *, guidance_channels: int = 3,
                         cache=None, want_cache: bool = False):
        """Classifier-free-guidance doubled-batch forward
        (reference models_original.py:250-266).

        The batch is [cond_half ; uncond_half]; only the first half of x is
        used (mirrored), and — preserving the reference's reproducibility
        quirk (:262) — guidance applies to the first `guidance_channels`
        channels only (3 by default; pass `in_channels` for standard CFG).
        """
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self(combined, t, y, cache=cache, want_cache=want_cache)
        if want_cache:
            model_out, new_cache = model_out
        eps, rest = model_out[:, :guidance_channels], model_out[:, guidance_channels:]
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        out = jnp.concatenate([eps, rest], axis=1)
        if want_cache:
            return out, new_cache
        return out


def dit_config(depth, hidden_size, patch_size, num_heads):
    """Constructor partial for a named config (reference models_original.py:328-362)."""
    return functools.partial(DiT, depth=depth, hidden_size=hidden_size,
                             patch_size=patch_size, num_heads=num_heads)


def dit_moe_config(depth, hidden_size, patch_size, num_heads, experts, top_k):
    """MoE variant config ('<E>E<A>A' = E experts, A activated per token —
    DiT-MoE naming). Beyond parity: the reference has no MoE family."""
    return functools.partial(DiT, depth=depth, hidden_size=hidden_size,
                             patch_size=patch_size, num_heads=num_heads,
                             moe_experts=experts, moe_top_k=top_k)


# Registry (reference models_original.py:365-370)
DiT_models = {
    "DiT-XL/2": dit_config(28, 1152, 2, 16),
    "DiT-XL/4": dit_config(28, 1152, 4, 16),
    "DiT-XL/8": dit_config(28, 1152, 8, 16),
    "DiT-L/2": dit_config(24, 1024, 2, 16),
    "DiT-L/4": dit_config(24, 1024, 4, 16),
    "DiT-L/8": dit_config(24, 1024, 8, 16),
    "DiT-B/2": dit_config(12, 768, 2, 12),
    "DiT-B/4": dit_config(12, 768, 4, 12),
    "DiT-B/8": dit_config(12, 768, 8, 12),
    "DiT-S/2": dit_config(12, 384, 2, 6),
    "DiT-S/4": dit_config(12, 384, 4, 6),
    "DiT-S/8": dit_config(12, 384, 8, 6),
    # MoE family (models/moe.py): same backbone, routed expert MLPs
    "DiT-MoE-S/2-8E2A": dit_moe_config(12, 384, 2, 6, 8, 2),
    "DiT-MoE-B/2-8E2A": dit_moe_config(12, 768, 2, 12, 8, 2),
    "DiT-MoE-XL/2-8E2A": dit_moe_config(28, 1152, 2, 16, 8, 2),
}
