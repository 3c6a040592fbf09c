"""DiT building blocks in flax.linen.

Behavioral parity with `/root/reference/train_options/models_original.py`:
`modulate` (:19), `TimestepEmbedder` (:27-64), `LabelEmbedder` (:67-94),
`DiTBlock` (:101-122), `FinalLayer` (:125-142), and the init scheme
(:182-216: xavier-uniform linears, N(0, 0.02) embedders, zeroed adaLN and
final layer). Redesigned TPU-first:

- PatchEmbed is a patch-reshape + one Dense (an einsum the MXU tiles
  natively) instead of a strided conv — bit-identical math to a conv whose
  stride equals its kernel, and the layout the torch-checkpoint importer
  flattens conv weights into.
- Attention is the pluggable backend op in `ops/attention.py` (Pallas flash
  attention on TPU); qkv is one fused projection with timm's (3, H, D/H)
  split order so reference checkpoints map 1:1.
- LayerNorms carry no affine (reference uses elementwise_affine=False); the
  adaLN shift/scale/gate math is left to XLA elementwise fusion.
- Compute dtype is a module knob (`dtype`) for bf16 activations with fp32
  params; LayerNorm statistics and softmax stay fp32.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention, resolve_backend

__all__ = [
    "modulate",
    "PatchEmbed",
    "TimestepEmbedder",
    "LabelEmbedder",
    "Attention",
    "Mlp",
    "DiTBlock",
    "FinalLayer",
    "QuantDenseGeneral",
]

xavier_uniform = nn.initializers.xavier_uniform()
zeros_init = nn.initializers.zeros
normal02 = nn.initializers.normal(stddev=0.02)


def modulate(x, shift, scale):
    """x * (1 + scale) + shift with (B, D) conditioners over (B, N, D) tokens
    (reference models_original.py:19-20)."""
    return x * (1 + scale[:, None, :]) + shift[:, None, :]


class PatchEmbed(nn.Module):
    """Patchify NCHW input to (B, N, D) tokens with a single Dense.

    Equivalent to the reference's conv-based timm PatchEmbed
    (models_original.py:169) — a conv with stride == kernel is exactly a
    Dense over patches flattened in (C, ph, pw) order, which is also how the
    torch conv weight `(D, C, ph, pw)` flattens for import.
    """

    patch_size: int
    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, C, H, W = x.shape
        p = self.patch_size
        assert H % p == 0 and W % p == 0, f"input {H}x{W} not divisible by patch {p}"
        gh, gw = H // p, W // p
        x = x.reshape(B, C, gh, p, gw, p)
        x = x.transpose(0, 2, 4, 1, 3, 5)          # (B, gh, gw, C, p, p)
        x = x.reshape(B, gh * gw, C * p * p)
        x = nn.Dense(
            self.hidden_size,
            kernel_init=xavier_uniform,             # reference models_original.py:195-198
            bias_init=zeros_init,
            dtype=self.dtype,
            name="proj",
        )(x)
        return x


class TimestepEmbedder(nn.Module):
    """Sinusoidal frequency embedding + MLP (reference models_original.py:27-64)."""

    hidden_size: int
    frequency_embedding_size: int = 256
    dtype: jnp.dtype = jnp.float32

    @staticmethod
    def timestep_embedding(t, dim, max_period=10000):
        """[cos | sin] embedding; frequencies exp(-log(P) * i / half)
        (reference models_original.py:40-59 — note cos-first order)."""
        half = dim // 2
        freqs = jnp.exp(
            -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        if dim % 2:
            embedding = jnp.concatenate(
                [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1)
        return embedding

    @nn.compact
    def __call__(self, t):
        t_freq = self.timestep_embedding(t, self.frequency_embedding_size)
        t_emb = nn.Dense(self.hidden_size, kernel_init=normal02,
                         bias_init=zeros_init, dtype=self.dtype, name="fc1")(t_freq)
        t_emb = nn.silu(t_emb)
        t_emb = nn.Dense(self.hidden_size, kernel_init=normal02,
                         bias_init=zeros_init, dtype=self.dtype, name="fc2")(t_emb)
        return t_emb


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG null-class dropout
    (reference models_original.py:67-94). The null class id == num_classes."""

    num_classes: int
    hidden_size: int
    dropout_prob: float

    def setup(self):
        use_cfg_embedding = int(self.dropout_prob > 0)
        self.embedding_table = nn.Embed(
            self.num_classes + use_cfg_embedding,
            self.hidden_size,
            embedding_init=normal02,  # reference models_original.py:201
            name="embedding_table",
        )

    def token_drop(self, labels, rng=None, force_drop_ids=None):
        if force_drop_ids is None:
            drop = jax.random.uniform(rng, (labels.shape[0],)) < self.dropout_prob
        else:
            drop = force_drop_ids == 1
        return jnp.where(drop, self.num_classes, labels)

    def __call__(self, labels, train: bool, force_drop_ids=None):
        use_dropout = self.dropout_prob > 0
        if (train and use_dropout) or (force_drop_ids is not None):
            rng = self.make_rng("label_drop") if force_drop_ids is None else None
            labels = self.token_drop(labels, rng, force_drop_ids)
        return self.embedding_table(labels)


class QuantDenseGeneral(nn.Module):
    """Int8 (W8A8) drop-in for `nn.Dense`/`nn.DenseGeneral` over trailing
    contraction axes.

    Defines the SAME "kernel"/"bias" params (shapes, initializers, fp32
    param dtype) as the flax modules it replaces, so a checkpoint trained
    with the bf16 path loads into the quantized model unchanged — the
    weights are quantized in-graph per call (ops/quant.py). Inference-only.
    """

    features: tuple  # int or tuple of output feature dims
    axis: tuple = (-1,)  # trailing contraction axes of the input
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = xavier_uniform
    bias_init: nn.initializers.Initializer = zeros_init
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.quant import int8_matmul

        features = (self.features if isinstance(self.features, (tuple, list))
                    else (self.features,))
        features = tuple(int(f) for f in features)
        axis = tuple(a % x.ndim for a in
                     (self.axis if isinstance(self.axis, (tuple, list))
                      else (self.axis,)))
        assert axis == tuple(range(x.ndim - len(axis), x.ndim)), (
            f"contraction axes {self.axis} must be trailing")
        contract = tuple(x.shape[a] for a in axis)

        # match flax DenseGeneral exactly: initializers run on the flattened
        # 2D/(features,) shapes (variance scaling sees true fan-in/out), then
        # reshape — so init(quant model) == init(float model) bit-for-bit
        def kernel_init_wrap(rng, shape, dtype):
            flat = (int(np.prod(shape[:len(contract)])),
                    int(np.prod(shape[len(contract):])))
            return self.kernel_init(rng, flat, dtype).reshape(shape)

        def bias_init_wrap(rng, shape, dtype):
            return self.bias_init(rng, (int(np.prod(shape)),), dtype).reshape(shape)

        kernel = self.param("kernel", kernel_init_wrap, contract + features,
                            jnp.float32)
        bias = (self.param("bias", bias_init_wrap, features, jnp.float32)
                if self.use_bias else None)
        K = int(np.prod(contract))
        N = int(np.prod(features))
        lead = x.shape[: x.ndim - len(axis)]
        out = int8_matmul(
            x.reshape(*lead, K), kernel.reshape(K, N),
            bias=None if bias is None else bias.reshape(N),
            out_dtype=self.dtype)
        return out.reshape(*lead, *features)


class _FlatQKV(nn.Module):
    """qkv projection emitting (B, N, 3*H*hd) directly — the lane-aligned
    layout the Pallas attention kernels consume.

    Param tree IDENTICAL to `nn.DenseGeneral(features=(3, H, hd))` — the
    (D, 3, H, hd) kernel is reshaped at use, not at rest — so checkpoints,
    the torch importer, and the TP sharding rules are unchanged. Exists
    because the 5D output layout is not physically flat on TPU (hd=72 pads
    to 128 lanes): emitting 5D and reshaping costs a full HBM round trip of
    the qkv tensor per call (measured 19 ms/step at XL/2 bs128, trace table
    in docs/ABLATIONS.md). The per-call weight reshape is (D, 3D)-sized —
    ~30x smaller traffic, and folded into the bf16 weight cast.
    """

    num_heads: int
    head_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = x.shape[-1]
        H, hd = self.num_heads, self.head_dim
        out = 3 * H * hd

        def kernel_init_wrap(rng, shape, dtype):
            # exactly DenseGeneral's wrapping: init on the flattened 2D shape
            return xavier_uniform(rng, (D, out), dtype).reshape(shape)

        kernel = self.param("kernel", kernel_init_wrap, (D, 3, H, hd),
                            jnp.float32)
        w = kernel.reshape(D, out).astype(self.dtype)
        y = x.astype(self.dtype) @ w
        if self.use_bias:
            bias = self.param(
                "bias", lambda r, s, d: zeros_init(r, (out,), d).reshape(s),
                (3, H, hd), jnp.float32)
            y = y + bias.reshape(out).astype(self.dtype)
        return y


class _FlatProj(nn.Module):
    """Output projection consuming the kernel's flat (B, N, H*hd) output.

    Param tree identical to `nn.DenseGeneral(features=D, axis=(-2, -1))`
    (kernel (H, hd, D), bias (D,)); avoids reshaping the attention output
    back to 5D (a lane-padding relayout) just to contract the head axes.
    """

    hidden_size: int
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        D = self.hidden_size
        H, hd = self.num_heads, self.head_dim

        def kernel_init_wrap(rng, shape, dtype):
            return xavier_uniform(rng, (H * hd, D), dtype).reshape(shape)

        kernel = self.param("kernel", kernel_init_wrap, (H, hd, D),
                            jnp.float32)
        bias = self.param("bias", zeros_init, (D,), jnp.float32)
        w = kernel.reshape(H * hd, D).astype(self.dtype)
        return x.astype(self.dtype) @ w + bias.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head self-attention with timm-compatible fused qkv
    (timm semantics as used at reference models_original.py:108).

    Kernels keep explicit head axes — qkv: (D, 3, H, hd), proj: (H, hd, D) —
    so tensor parallelism shards the H axis directly (no fused-dim reshape
    for GSPMD to untangle). Numerically identical to the fused layout; the
    checkpoint importer reshapes torch's (3D, D) weights into these axes.
    On the Pallas/hybrid paths the projections compute in the flat
    (B, N, 3D)/(B, N, D) layouts (`_FlatQKV`/`_FlatProj`, same params) so
    no tensor is ever relayouted between projection and kernel.
    """

    hidden_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    quant: Optional[str] = None  # "w8a8" int8 projections (inference only)

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        H = self.num_heads
        assert D % H == 0
        hd = D // H
        # the projections compute (and the kernel consumes) self.dtype
        backend = resolve_backend(self.attn_backend, N, B, H, self.dtype)
        if backend == "pallas" and not self.quant:
            # layout-native path: project straight into the flat (B, N, 3D)
            # lane-aligned layout the Pallas kernels consume and keep the
            # output flat through the out-projection — zero relayouts end to
            # end (+5% train steps/sec at XL/2 bs128). NOT used for
            # "hybrid": there the XLA forward wants the 5D layout — its
            # reshape pair cancels in forward-only sampling, while a genuine
            # flat projection forces a real relayout before the fused
            # attention (measured 1.19 vs 1.40 img/s at 256² bs8).
            from ..ops.flash_attention import flash_attention_qkv_flat

            qkv = _FlatQKV(H, hd, use_bias=self.qkv_bias, dtype=self.dtype,
                           name="qkv")(x)
            out = flash_attention_qkv_flat(qkv, H, fwd_impl="pallas")
            return _FlatProj(D, H, hd, dtype=self.dtype, name="proj")(out)
        dense = QuantDenseGeneral if self.quant else nn.DenseGeneral
        qkv = dense(
            features=(3, H, hd), use_bias=self.qkv_bias, kernel_init=xavier_uniform,
            bias_init=zeros_init, dtype=self.dtype, name="qkv")(x)
        if backend in ("pallas", "hybrid"):
            from ..ops.flash_attention import flash_attention_qkv

            out = flash_attention_qkv(
                qkv, fwd_impl="pallas" if backend == "pallas" else "xla")
        else:
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, hd)
            out = dot_product_attention(q, k, v, backend=backend)
        out = dense(
            features=D, axis=(-2, -1), kernel_init=xavier_uniform,
            bias_init=zeros_init, dtype=self.dtype, name="proj")(out)
        return out


class Mlp(nn.Module):
    """Dense -> GELU(tanh) -> Dense (timm Mlp with approximate GELU,
    reference models_original.py:110-112)."""

    hidden_features: int
    out_features: int
    dtype: jnp.dtype = jnp.float32
    quant: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        dense = QuantDenseGeneral if self.quant else nn.Dense
        x = dense(self.hidden_features, kernel_init=xavier_uniform,
                  bias_init=zeros_init, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=True)
        x = dense(self.out_features, kernel_init=xavier_uniform,
                  bias_init=zeros_init, dtype=self.dtype, name="fc2")(x)
        return x


def _layer_norm(x, dtype):
    """LayerNorm with no learnable affine, eps=1e-6, fp32 statistics
    (reference models_original.py:107,109,131)."""
    return nn.LayerNorm(
        epsilon=1e-6, use_bias=False, use_scale=False, dtype=dtype)(x)


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block (reference models_original.py:101-122).

    The 6 modulation params (shift/scale/gate for attn and mlp) come from
    SiLU(c) -> Dense(6D) initialized to zero, so the block starts as identity.

    setup-style (not compact) so three entry points can share the params:
    `__call__` (the standard block), `full_step` (also returns the attention
    and MLP branch outputs), and `cached_step` (reuses previously computed
    branch outputs with fresh adaLN gates — the FORA-style layer cache for
    sampling, see diffusion/sampling.py cached loops).
    """

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    attn_backend: str = "auto"
    quant: Optional[str] = None  # int8 qkv/proj/fc1/fc2 (inference only)
    # token merging (ops/tome.py): attention runs on N - tome_r tokens,
    # merged per block by input similarity. 0 = off (bit-exact default)
    tome_r: int = 0
    # also merge the MLP branch: ~2x the flops saving but ~8x the drift on
    # a trained model (MLP is purely per-token, so merging forces identical
    # outputs within groups — the ToMe-SD finding, measured in ABLATIONS)
    tome_mlp: bool = False
    # mixture-of-experts MLP (models/moe.py, DiT-MoE-style): 0 = dense
    # (bit-exact canonical block). Expert weights carry a leading expert
    # axis shardable over the mesh (expert parallelism, parallel/mesh.py)
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity: float = 1.25

    def setup(self):
        # adaLN is batch-indexed (B, D) -> (B, 6D): ~1/256th of the token
        # projections' flops — stays in the activation dtype even when quant
        self.adaLN_modulation = nn.Dense(
            6 * self.hidden_size, kernel_init=zeros_init,
            bias_init=zeros_init, dtype=self.dtype)
        self.attn = Attention(self.hidden_size, self.num_heads,
                              dtype=self.dtype, attn_backend=self.attn_backend,
                              quant=self.quant)
        if self.moe_experts > 0:
            from .moe import MoeMlp
            assert self.quant is None, "int8 quant + MoE is untested"
            self.mlp = MoeMlp(self.moe_experts,
                              int(self.hidden_size * self.mlp_ratio),
                              self.hidden_size, top_k=self.moe_top_k,
                              capacity_factor=self.moe_capacity,
                              dtype=self.dtype)
        else:
            self.mlp = Mlp(int(self.hidden_size * self.mlp_ratio),
                           self.hidden_size, dtype=self.dtype,
                           quant=self.quant)
        # LayerNorms carry no params; instances exist only so non-compact
        # methods can use them
        self.norm1 = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                  use_scale=False, dtype=self.dtype)
        self.norm2 = nn.LayerNorm(epsilon=1e-6, use_bias=False,
                                  use_scale=False, dtype=self.dtype)

    def _modulation(self, c):
        mod = self.adaLN_modulation(nn.silu(c))
        return jnp.split(mod, 6, axis=-1)

    def __call__(self, x, c):
        x, _ = self.full_step(x, c)
        return x

    def full_step(self, x, c):
        """Block forward that also returns (attn_out, mlp_out) for caching.

        With `tome_r > 0` (token merging, ops/tome.py) one match is computed
        from the block input and the attention branch (plus the MLP branch
        iff `tome_mlp` — ToMe-SD's per-branch scheme with its default off)
        runs on the merged N - tome_r tokens; the unmerged branch outputs
        keep the residual stream — and the FORA cache contract — at full
        length.
        """
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = self._modulation(c)
        if self.tome_r > 0:
            from ..ops.tome import bipartite_soft_matching_2d
            m, u = bipartite_soft_matching_2d(x, self.tome_r)
        else:
            m = u = lambda t: t
        mm, um = (m, u) if self.tome_mlp else (lambda t: t, lambda t: t)
        attn_out = u(self.attn(m(modulate(self.norm1(x), shift_msa, scale_msa))))
        # names are no-ops unless a selective remat policy saves them
        # (models/dit.py remat_policy="attn"/"attn_mlp")
        attn_out = checkpoint_name(attn_out, "attn_out")
        x = x + gate_msa[:, None, :] * attn_out
        mlp_out = um(self.mlp(mm(modulate(self.norm2(x), shift_mlp, scale_mlp))))
        mlp_out = checkpoint_name(mlp_out, "mlp_out")
        x = x + gate_mlp[:, None, :] * mlp_out
        return x, (attn_out, mlp_out)

    def cached_step(self, x, c, attn_out, mlp_out):
        """Residual update reusing cached branch outputs: only the adaLN
        gates (a Dense on c) are recomputed — ~1% of the block's FLOPs."""
        (_, _, gate_msa, _, _, gate_mlp) = self._modulation(c)
        x = x + gate_msa[:, None, :] * attn_out
        x = x + gate_mlp[:, None, :] * mlp_out
        return x


class FinalLayer(nn.Module):
    """adaLN (2-param) + zero-initialized linear head
    (reference models_original.py:125-142)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(2 * self.hidden_size, kernel_init=zeros_init,
                       bias_init=zeros_init, dtype=self.dtype,
                       name="adaLN_modulation")(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = modulate(_layer_norm(x, self.dtype), shift, scale)
        x = nn.Dense(self.patch_size * self.patch_size * self.out_channels,
                     kernel_init=zeros_init, bias_init=zeros_init,
                     dtype=self.dtype, name="linear")(x)
        return x
