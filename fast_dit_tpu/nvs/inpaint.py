"""Diffusion inpainting of masked regions (disocclusion hole filling).

Capability parity with the reference's `inpainting.py`, which fills
warp-disocclusion holes with a Stable-Diffusion inpainting pipeline
(`/root/reference/inpainting.py:61-99`; mask = black pixels :96-99).
TPU-native, self-contained redesign: RePaint-style masked resampling with
ANY of our diffusion models — at every reverse step the known region is
re-injected from q_sample(known, t-noised) so the model only generates inside
the mask, all inside one `lax.scan`. Also exports the reference's
mask-from-black-pixels helper so warped images plug straight in.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion import gaussian
from ..diffusion.schedule import DiffusionSchedule

__all__ = ["mask_from_black_pixels", "inpaint_sample_loop"]


def mask_from_black_pixels(img: np.ndarray, threshold: int = 0) -> np.ndarray:
    """(H, W, 3) uint8 -> (H, W) bool mask of holes (all-black pixels),
    the reference's mask construction (inpainting.py:96-99)."""
    img = np.asarray(img)
    return (img <= threshold).all(axis=-1)


def inpaint_sample_loop(
    model_fn: Callable,
    known: jnp.ndarray,
    mask: jnp.ndarray,
    sched: DiffusionSchedule,
    *,
    rng: jax.Array,
    clip_denoised: bool = True,
    jump_n: int = 1,
    dtype=jnp.float32,
):
    """RePaint-style inpainting.

    known: (B, C, H, W) image/latent with valid content outside the holes.
    mask:  broadcastable to `known`; 1 = HOLE to fill, 0 = keep.
    model_fn(x, t_original) -> model output (same contract as the samplers).
    jump_n: resampling passes per step (RePaint's harmonization; 1 = plain
    masked replacement).

    At each reverse step t: x_t <- mask * x_t + (1-mask) * q_sample(known, t).
    """
    mask = jnp.broadcast_to(jnp.asarray(mask, dtype), known.shape)
    known = jnp.asarray(known, dtype)
    B = known.shape[0]
    T = sched.num_timesteps
    x_init = jax.random.normal(jax.random.fold_in(rng, 2 ** 30), known.shape, dtype)

    def step_once(x, i, key):
        t = jnp.full((B,), i, jnp.int32)
        # re-inject the known region at this noise level
        known_noise = jax.random.normal(jax.random.fold_in(key, 1), known.shape, dtype)
        x_known = gaussian.q_sample(sched, known, t, known_noise)
        # at t == 0 the known region is the clean image itself
        x_known = jnp.where((t == 0).reshape(-1, *([1] * (known.ndim - 1))),
                            known, x_known)
        x = mask * x + (1.0 - mask) * x_known
        out = model_fn(x, sched.timestep_map[t])
        n = jax.random.normal(jax.random.fold_in(key, 2), known.shape, dtype)
        res = gaussian.p_sample_step(sched, out, x, t, n, clip_denoised=clip_denoised)
        return res.sample

    def body(x, i):
        key = jax.random.fold_in(rng, i)

        def resample(k, x):
            kk = jax.random.fold_in(key, k)
            x = step_once(x, i, kk)
            # jump back up one step (re-noise) except on the final pass
            def renoise(x):
                t_prev = jnp.full((B,), jnp.maximum(i - 1, 0), jnp.int32)
                beta = gaussian.extract(sched.betas, t_prev + 0, x.ndim, x.dtype)
                n = jax.random.normal(jax.random.fold_in(kk, 3), x.shape, dtype)
                return jnp.sqrt(1.0 - beta) * x + jnp.sqrt(beta) * n

            x = jax.lax.cond((k < jump_n - 1) & (i > 0), renoise, lambda v: v, x)
            return x

        x = jax.lax.fori_loop(0, jump_n, resample, x)
        return x, None

    idx = jnp.arange(T - 1, -1, -1)
    final, _ = jax.lax.scan(body, x_init, idx)
    # pin the known region exactly in the output
    return mask * final + (1.0 - mask) * known
