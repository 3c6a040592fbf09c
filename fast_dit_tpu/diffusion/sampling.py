"""Sampling loops compiled as a single `jax.lax.scan` over timesteps.

The reference runs its reverse process as a Python loop of 250 sequential
model dispatches (`/root/reference/diffusion/gaussian_diffusion.py:464-511`
for DDPM, :633-680 for DDIM). Here the whole chain — timestep-map gather
(respace.py:124-129), model forward, p/ddim step, and noise injection — is one
scan body, so XLA compiles the entire sampler into one program with no host
round-trips.

Noise injection: every loop accepts either a JAX PRNG key (`rng`) or explicit
noise arrays (`noise` for x_T, `step_noise[k]` for the k-th step's Gaussian),
so an external RNG stream (e.g. recorded torch `randn` draws) can be replayed
bit-for-bit — the fidelity pin anticipated by the reference's
`p_sample_loop(noise=...)` argument (gaussian_diffusion.py:423).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from . import gaussian
from .schedule import DiffusionSchedule

__all__ = ["p_sample_loop", "ddim_sample_loop", "ddim_reverse_sample_loop"]


def _init_noise(shape, noise, rng, dtype):
    if noise is not None:
        return jnp.asarray(noise, dtype=dtype)
    if rng is None:
        raise ValueError("either `noise` or `rng` must be provided")
    # fold_in with an index >= num steps: never collides with per-step keys
    return jax.random.normal(jax.random.fold_in(rng, 2 ** 30), shape, dtype)


def _loop(
    step_kind: str,
    model_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    rng=None,
    noise=None,
    step_noise=None,
    clip_denoised=True,
    denoised_fn=None,
    cond_fn=None,
    eta=0.0,
    return_intermediates=False,
    dtype=jnp.float32,
):
    if noise is not None:
        shape = noise.shape
    x_init = _init_noise(shape, noise, rng, dtype)
    B = shape[0]
    T = sched.num_timesteps
    needs_noise = step_kind == "p" or (step_kind == "ddim" and eta != 0.0)
    if needs_noise and step_noise is None and rng is None:
        raise ValueError("stochastic sampling needs `rng` or `step_noise`")
    if step_noise is not None:
        step_noise = jnp.asarray(step_noise, dtype=dtype)
        assert step_noise.shape == (T, *shape), (
            f"step_noise must be (T, *shape) = {(T, *shape)}, got {step_noise.shape}"
        )

    def body(x, scan_in):
        k, i = scan_in  # k: 0..T-1 step counter; i = T-1-k: timestep index
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_model = sched.timestep_map[t]
        model_output = model_fn(x, t_model)
        cond_grad = cond_fn(x, t_model) if cond_fn is not None else None
        if needs_noise:
            if step_noise is not None:
                n = step_noise[k]
            else:
                n = jax.random.normal(jax.random.fold_in(rng, i), shape, dtype)
        else:
            n = None
        if step_kind == "p":
            res = gaussian.p_sample_step(
                sched, model_output, x, t, n,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_grad=cond_grad,
            )
        elif step_kind == "ddim":
            res = gaussian.ddim_step(
                sched, model_output, x, t, n, eta=eta,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_grad=cond_grad,
            )
        else:  # ddim_reverse
            res = gaussian.ddim_reverse_step(
                sched, model_output, x, t,
                clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_grad=cond_grad,
            )
        ys = res.sample if return_intermediates else None
        return res.sample, ys

    if step_kind == "ddim_reverse":
        idx = jnp.arange(T)          # forward: t = 0 .. T-1
    else:
        idx = jnp.arange(T - 1, -1, -1)  # reverse: t = T-1 .. 0
    ks = jnp.arange(T)
    final, intermediates = jax.lax.scan(body, x_init, (ks, idx))
    if return_intermediates:
        return final, intermediates
    return final


def p_sample_loop(
    model_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    rng: Optional[jax.Array] = None,
    noise=None,
    step_noise=None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """DDPM ancestral sampling (reference gaussian_diffusion.py:419-511).

    `model_fn(x, t_original)` receives original-process timesteps: the
    respacing remap is already applied inside the loop.
    """
    return _loop(
        "p", model_fn, shape, sched, rng=rng, noise=noise, step_noise=step_noise,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn,
        return_intermediates=return_intermediates, dtype=dtype,
    )


def ddim_sample_loop(
    model_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    rng: Optional[jax.Array] = None,
    noise=None,
    step_noise=None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    eta: float = 0.0,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """DDIM sampling (reference gaussian_diffusion.py:600-680)."""
    return _loop(
        "ddim", model_fn, shape, sched, rng=rng, noise=noise, step_noise=step_noise,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn, eta=eta,
        return_intermediates=return_intermediates, dtype=dtype,
    )


def ddim_reverse_sample_loop(
    model_fn: Callable,
    x_start,
    sched: DiffusionSchedule,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """DDIM reverse ODE: encode x_0 -> x_T (reference gaussian_diffusion.py:562-598)."""
    return _loop(
        "ddim_reverse", model_fn, x_start.shape, sched, noise=x_start,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn, cond_fn=cond_fn,
        return_intermediates=return_intermediates, dtype=dtype,
    )
