"""SD-VAE (AutoencoderKL, kl-f8) in flax — encoder, decoder, and the
diagonal-Gaussian latent distribution.

The reference consumes this model externally via
`diffusers.AutoencoderKL.from_pretrained("stabilityai/sd-vae-ft-{ema,mse}")`
(`/root/reference/train.py:156`, `sample.py:44`, `extract_features.py:135`)
with the 0.18215 latent scale (`extract_features.py:168`, `sample.py:65`).
Here it is a native flax module (the SURVEY.md §7 "VAE port" risk item):
standard kl-f8 architecture — 4 down/up stages at (128, 256, 512, 512)
channels, 2 resnet blocks per encoder stage / 3 per decoder stage,
GroupNorm(32, eps=1e-6) + SiLU, single-head mid-block attention — with a
diffusers-format weight importer in `ckpt/vae_import.py`.

Layout: public API is NCHW (the reference contract); convs run NHWC
internally (TPU-native layout for XLA convolutions).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = ["AutoencoderKL", "DiagonalGaussian", "VAE_SCALE"]

VAE_SCALE = 0.18215  # reference extract_features.py:168 / sample.py:65


def _gn(x):
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=None)(x)


class ResnetBlock(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        h = nn.GroupNorm(32, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head full self-attention over spatial positions (mid block)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        h = nn.GroupNorm(32, epsilon=1e-6, name="group_norm")(x)
        h = h.reshape(B, H * W, C)
        q = nn.Dense(C, dtype=self.dtype, name="to_q")(h)
        k = nn.Dense(C, dtype=self.dtype, name="to_k")(h)
        v = nn.Dense(C, dtype=self.dtype, name="to_v")(h)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32) * (C ** -0.5)
        attn = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
        h = jnp.einsum("bqk,bkc->bqc", attn, v)
        h = nn.Dense(C, dtype=self.dtype, name="to_out")(h)
        return x + h.reshape(B, H, W, C)


class Downsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # asymmetric (0,1) padding + stride-2 conv (kl-f8 downsampler)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")
        return nn.Conv(C, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(self.block_out_channels):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype,
                                name=f"down_{i}_resnet_{j}")(x)
            if i < len(self.block_out_channels) - 1:
                x = Downsample(dtype=self.dtype, name=f"down_{i}_downsample")(x)
        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_resnet_1")(x)
        x = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * self.latent_channels, (3, 3), padding=1,
                    dtype=self.dtype, name="conv_out")(x)
        return x  # moments: (B, h, w, 2*latent)


class Decoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 3  # decoder uses layers_per_block+1 = 3 resnets
    out_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        rev = list(reversed(self.block_out_channels))   # (512, 512, 256, 128)
        x = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_resnet_0")(x)
        x = AttnBlock(dtype=self.dtype, name="mid_attn")(x)
        x = ResnetBlock(x.shape[-1], dtype=self.dtype, name="mid_resnet_1")(x)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                x = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_resnet_{j}")(x)
            if i < len(rev) - 1:
                x = Upsample(dtype=self.dtype, name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(32, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x


class DiagonalGaussian:
    """Latent distribution over moments (mean | logvar), channel-last."""

    def __init__(self, moments: jnp.ndarray):
        self.mean, logvar = jnp.split(moments, 2, axis=-1)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, self.mean.dtype)

    def mode(self) -> jnp.ndarray:
        return self.mean


class AutoencoderKL(nn.Module):
    """kl-f8 VAE. `encode_moments`/`decode` take/return NCHW like the
    reference's diffusers calls; latent = image/8 with 4 channels."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    latent_channels: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out_channels, 2, self.latent_channels,
                               dtype=self.dtype)
        self.decoder = Decoder(self.block_out_channels, 3, 3, dtype=self.dtype)
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1),
                                  dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = nn.Conv(self.latent_channels, (1, 1),
                                       dtype=self.dtype, name="post_quant_conv")

    def encode_moments(self, x_nchw: jnp.ndarray) -> jnp.ndarray:
        """(B, 3, H, W) -> moments (B, 8, H/8, W/8)."""
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        moments = self.quant_conv(self.encoder(x))
        return jnp.transpose(moments, (0, 3, 1, 2))

    def decode(self, z_nchw: jnp.ndarray) -> jnp.ndarray:
        """(B, 4, h, w) latents (unscaled) -> (B, 3, 8h, 8w) images."""
        z = jnp.transpose(z_nchw, (0, 2, 3, 1))
        x = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(x, (0, 3, 1, 2))

    def __call__(self, x_nchw, rng):
        """Full autoencode pass (used for init)."""
        moments = self.encode_moments(x_nchw)
        dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
        z = jnp.transpose(dist.sample(rng), (0, 3, 1, 2))
        return self.decode(z)


def encode_to_latents(vae: AutoencoderKL, params, x_nchw, rng) -> jnp.ndarray:
    """images -> scaled latents: `vae.encode(x).latent_dist.sample() * 0.18215`
    (reference extract_features.py:168)."""
    moments = vae.apply(params, x_nchw, method=vae.encode_moments)
    dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
    z = jnp.transpose(dist.sample(rng), (0, 3, 1, 2))
    return z * VAE_SCALE


def decode_from_latents(vae: AutoencoderKL, params, z_nchw) -> jnp.ndarray:
    """scaled latents -> images: `vae.decode(z / 0.18215).sample`
    (reference sample.py:65)."""
    return vae.apply(params, z_nchw / VAE_SCALE, method=vae.decode)
