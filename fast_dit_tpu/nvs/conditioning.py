"""DINO-feature cross-attention conditioning for DiT (the fork's NVS model).

Capability parity with the reference's research DiT variant
(`/root/reference/models.py`): a per-block `CrossAttention` against DINO
tokens (:506-567), a 9-way adaLN chunk gating attn / cross-attn / mlp
(:583-601), a `dino_embedder` PatchEmbed (:652), and cross-attention applied
only at a chosen set of layers (:745-751). Fixed by design (SURVEY.md §7
"what we do NOT carry over"): the stateful block counter becomes a static
per-layer mask threaded through the scan, the broken
`forward_with_cfg` arity (models.py:763) is corrected to pass the DINO
features through, and conditioning uses `c = t + y` rather than the fork's
commented-out label add (kept available via `condition_on_labels=False`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..models.dit import DiT_models, dit_config  # noqa: F401  (re-export convenience)
from ..models.layers import (
    FinalLayer,
    LabelEmbedder,
    Mlp,
    PatchEmbed,
    TimestepEmbedder,
    modulate,
    xavier_uniform,
    zeros_init,
)
from ..models.pos_embed import get_2d_sincos_pos_embed
from ..ops.attention import dot_product_attention

__all__ = ["CrossAttention", "DiTCrossBlock", "DiTNVS"]


class CrossAttention(nn.Module):
    """Queries from image tokens, keys/values from context (DINO) tokens
    (reference models.py:506-567)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, context):
        B, N, D = x.shape
        H = self.num_heads
        hd = D // H
        q = nn.DenseGeneral((H, hd), kernel_init=xavier_uniform,
                            bias_init=zeros_init, dtype=self.dtype, name="to_q")(x)
        k = nn.DenseGeneral((H, hd), kernel_init=xavier_uniform,
                            bias_init=zeros_init, dtype=self.dtype, name="to_k")(context)
        v = nn.DenseGeneral((H, hd), kernel_init=xavier_uniform,
                            bias_init=zeros_init, dtype=self.dtype, name="to_v")(context)
        out = dot_product_attention(q, k, v, backend=self.attn_backend)
        return nn.DenseGeneral(D, axis=(-2, -1), kernel_init=xavier_uniform,
                               bias_init=zeros_init, dtype=self.dtype,
                               name="proj")(out)


class DiTCrossBlock(nn.Module):
    """adaLN-Zero block with a gated cross-attention branch: 9 modulation
    params (shift/scale/gate x [self-attn, cross-attn, mlp])
    (reference models.py:570-601). `use_cross` is a static 0/1 scalar per
    layer; at 0 the cross branch contributes exactly nothing."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, c, context, use_cross):
        from ..models.layers import Attention, _layer_norm

        mod = nn.Dense(9 * self.hidden_size, kernel_init=zeros_init,
                       bias_init=zeros_init, dtype=self.dtype,
                       name="adaLN_modulation")(nn.silu(c))
        (s_msa, sc_msa, g_msa,
         s_cross, sc_cross, g_cross,
         s_mlp, sc_mlp, g_mlp) = jnp.split(mod, 9, axis=-1)

        attn_out = Attention(self.hidden_size, self.num_heads, dtype=self.dtype,
                             attn_backend=self.attn_backend, name="attn")(
            modulate(_layer_norm(x, self.dtype), s_msa, sc_msa))
        x = x + g_msa[:, None, :] * attn_out

        cross_out = CrossAttention(self.hidden_size, self.num_heads,
                                   dtype=self.dtype,
                                   attn_backend=self.attn_backend, name="cross_attn")(
            modulate(_layer_norm(x, self.dtype), s_cross, sc_cross), context)
        x = x + use_cross * g_cross[:, None, :] * cross_out

        mlp_out = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                      dtype=self.dtype, name="mlp")(
            modulate(_layer_norm(x, self.dtype), s_mlp, sc_mlp))
        x = x + g_mlp[:, None, :] * mlp_out
        return x


class DiTNVS(nn.Module):
    """DiT with DINO cross-attention at `cross_layers`
    (reference models.py DiT, forward at :733-754)."""

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
    dino_dim: int = 768
    dino_patch_grid: int = 16     # DINO token grid side (tokens = grid^2)
    cross_layers: tuple = (13, 15)  # 0-indexed; = fork's counter values 14, 16
    condition_on_labels: bool = True  # fork used c = t only (models.py:743)
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"

    @property
    def out_channels(self):
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    def unpatchify(self, x):
        c = self.out_channels
        p = self.patch_size
        h = w = int(x.shape[1] ** 0.5)
        x = x.reshape(x.shape[0], h, w, p, p, c)
        x = jnp.einsum("nhwpqc->nchpwq", x)
        return x.reshape(x.shape[0], c, h * p, w * p)

    @nn.compact
    def __call__(self, x, t, dino_feat, y, *, train: bool = False,
                 force_drop_ids=None):
        """x: (B, C, H, W); dino_feat: (B, dino_dim, gh, gw) feature map.

        Keeps the fork's forward signature (models.py:733) with the
        stateful layer counter replaced by the static `cross_layers` set.
        """
        x = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype,
                       name="x_embedder")(x)
        pos = get_2d_sincos_pos_embed(self.hidden_size,
                                      self.input_size // self.patch_size)
        x = x + jnp.asarray(pos, dtype=x.dtype)[None]

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype,
                                 name="t_embedder")(t)
        y_emb = LabelEmbedder(self.num_classes, self.hidden_size,
                              self.class_dropout_prob, name="y_embedder")(
            y, train, force_drop_ids)
        c = t_emb + (y_emb.astype(t_emb.dtype) if self.condition_on_labels else 0.0)

        # DINO feature map -> context tokens (reference dino_embedder, :652)
        dino_tokens = PatchEmbed(1, self.hidden_size, dtype=self.dtype,
                                 name="dino_embedder")(dino_feat)

        cross_mask = np.zeros((self.depth, 1, 1), np.float32)
        for layer in self.cross_layers:
            assert 0 <= layer < self.depth, (
                f"cross layer {layer} out of range for depth {self.depth}")
            cross_mask[layer] = 1.0

        block_cls = DiTCrossBlock

        class BlockStack(nn.Module):
            hidden_size: int
            num_heads: int
            mlp_ratio: float
            dtype: jnp.dtype
            attn_backend: str

            @nn.compact
            def __call__(self, carry, mask_i):
                xs, cs, ctx = carry
                xs = block_cls(self.hidden_size, self.num_heads,
                               mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                               attn_backend=self.attn_backend, name="block")(
                    xs, cs, ctx, mask_i.astype(xs.dtype))
                return (xs, cs, ctx), None

        stack = nn.scan(
            BlockStack,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
            metadata_params={nn.meta.PARTITION_NAME: "layers"},
        )(self.hidden_size, self.num_heads, self.mlp_ratio, self.dtype,
          self.attn_backend, name="blocks")
        (x, _, _), _ = stack((x, c, dino_tokens), jnp.asarray(cross_mask))

        x = FinalLayer(self.hidden_size, self.patch_size, self.out_channels,
                       dtype=self.dtype, name="final_layer")(x, c)
        return self.unpatchify(x).astype(jnp.float32)

    def forward_with_cfg(self, x, t, dino_feat, y, cfg_scale,
                         *, guidance_channels: int = 3):
        """CFG forward with the arity FIXED (the fork's own
        forward_with_cfg calls forward with 3 args and crashes,
        models.py:763; SURVEY.md §0 'critical fork caveat')."""
        half = x[: x.shape[0] // 2]
        combined = jnp.concatenate([half, half], axis=0)
        model_out = self(combined, t, dino_feat, y)
        eps, rest = (model_out[:, :guidance_channels],
                     model_out[:, guidance_channels:])
        cond_eps, uncond_eps = jnp.split(eps, 2, axis=0)
        half_eps = uncond_eps + cfg_scale * (cond_eps - uncond_eps)
        eps = jnp.concatenate([half_eps, half_eps], axis=0)
        return jnp.concatenate([eps, rest], axis=1)
