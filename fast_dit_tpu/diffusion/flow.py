"""Flow matching: stochastic-interpolant training + probability-flow ODE
sampling — the SiT-family objective on the same DiT backbone.

Beyond-reference capability: the reference trains only the DDPM
epsilon/learned-sigma objective (`/root/reference/diffusion/
gaussian_diffusion.py:715-790`) and samples its discrete-time chain. Flow
matching (Lipman et al., arXiv:2210.02747; rectified flow, Liu et al.,
arXiv:2209.03003) is the continuous-time objective the DiT lineage moved to
(SiT, Ma et al., arXiv:2401.08740 — same architecture, velocity target), and
it drops into this framework because the DiT's sinusoidal timestep embedder
is already continuous (`models/layers.py TimestepEmbedder`).

Conventions (SiT's): t ∈ [0, 1], t=0 is data, t=1 is noise,

    x_t = alpha(t) · x0 + sigma(t) · eps,      eps ~ N(0, I)

with interpolant paths
    "linear": alpha = 1 - t,        sigma = t            (rectified flow)
    "gvp":    alpha = cos(pi t/2),  sigma = sin(pi t/2)  (variance preserving)

The model predicts the velocity v(x_t, t) = d/dt x_t; the training loss is
E ||v_theta(x_t, t) - (alpha'(t) x0 + sigma'(t) eps)||², and sampling
integrates the probability-flow ODE dx/dt = v from t=1 (pure noise) down to
t=0 with Euler or Heun steps, as ONE `lax.scan` like every other loop here.

The model sees `t * t_scale` (default 1000.0) so the embedding frequencies
cover the same range as the discrete-time diffusion objective. Build the DiT
with `learn_sigma=False` — the velocity has exactly `in_channels` channels;
for CFG use `forward_with_cfg(..., guidance_channels=in_channels)` (guiding
the full velocity — the reference's 3-channel quirk is an artifact of the
eps parameterization, not carried over).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "FLOW_PATHS",
    "flow_path_coeffs",
    "flow_training_losses",
    "flow_sample_loop",
    "flow_reverse_loop",
]

FLOW_PATHS = ("linear", "gvp")


def flow_path_coeffs(t, path: str = "linear"):
    """(alpha, sigma, d_alpha, d_sigma) at continuous time t ∈ [0, 1].

    Pure fp32 elementwise math; `t` may be any shape (the caller broadcasts
    against image axes).
    """
    t = jnp.asarray(t, jnp.float32)
    if path == "linear":
        return (1.0 - t, t,
                jnp.full_like(t, -1.0), jnp.full_like(t, 1.0))
    if path == "gvp":
        h = math.pi / 2.0
        return (jnp.cos(h * t), jnp.sin(h * t),
                -h * jnp.sin(h * t), h * jnp.cos(h * t))
    raise NotImplementedError(f"unknown flow path: {path!r}")


def _bcast(c, x):
    return c.reshape(c.shape + (1,) * (x.ndim - c.ndim)).astype(x.dtype)


def flow_training_losses(
    model_fn: Callable,
    x_start,
    t,
    noise,
    *,
    path: str = "linear",
    t_scale: float = 1000.0,
):
    """Per-example velocity-matching MSE (the flow analog of
    `gaussian.training_losses`).

    model_fn(x_t, t_model) -> velocity with x_t's shape; t is (B,) floats in
    [0, 1]; the model receives `t * t_scale`. Returns {"loss", "mse"} with a
    (B,)-shaped per-example loss, the same contract the trainer consumes
    (`train/train_lib.py loss_for`).
    """
    alpha, sigma, d_alpha, d_sigma = flow_path_coeffs(t, path)
    x_t = _bcast(alpha, x_start) * x_start + _bcast(sigma, noise) * noise
    target = _bcast(d_alpha, x_start) * x_start + _bcast(d_sigma, noise) * noise
    v = model_fn(x_t, (t * t_scale).astype(x_t.dtype))
    assert v.shape == x_t.shape, (
        f"flow model must predict velocity with the input's shape, got "
        f"{v.shape} vs {x_t.shape} — build the DiT with learn_sigma=False")
    mse = jnp.mean((v.astype(jnp.float32) - target.astype(jnp.float32)) ** 2,
                   axis=tuple(range(1, x_t.ndim)))
    return {"loss": mse, "mse": mse}


def _integrate(model_fn, x, ts, *, method: str, t_scale: float):
    """One lax.scan over the (static) time grid `ts`; Euler (1 NFE/step) or
    Heun (2 NFE/step, 2nd order)."""
    ts = jnp.asarray(ts, jnp.float32)

    def model_t(x, t):
        tb = jnp.full((x.shape[0],), t * t_scale, x.dtype)
        return model_fn(x, tb)

    def body(x, tt):
        t_cur, t_next = tt
        dt = t_next - t_cur
        v1 = model_t(x, t_cur)
        if method == "euler":
            x_next = x + dt * v1
        elif method == "heun":
            x_pred = x + dt * v1
            v2 = model_t(x_pred, t_next)
            x_next = x + dt * 0.5 * (v1 + v2)
        else:
            raise NotImplementedError(f"unknown ODE method: {method!r}")
        return x_next, x_next

    pairs = (ts[:-1], ts[1:])
    x_final, xs = jax.lax.scan(body, x, pairs)
    return x_final, xs


def flow_sample_loop(
    model_fn: Callable,
    shape,
    *,
    num_steps: int = 50,
    method: str = "heun",
    noise=None,
    rng: Optional[jax.Array] = None,
    path: str = "linear",
    t_scale: float = 1000.0,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """Integrate the probability-flow ODE from t=1 (noise) to t=0 (data).

    Same contract as the diffusion loops (`sampling.p_sample_loop`): pass
    `noise` for a deterministic chain or `rng` to draw it; `model_fn(x, t)`
    receives a (B,)-shaped t already scaled by `t_scale`. Heun evaluates the
    model twice per step (2·num_steps NFE) for 2nd-order accuracy; Euler is
    1 NFE/step. `path` must match training.
    """
    del path  # the trained velocity field already encodes the path
    if noise is None:
        assert rng is not None, "pass `noise` or `rng`"
        noise = jax.random.normal(rng, shape, dtype)
    x = noise.astype(dtype)
    ts = jnp.linspace(1.0, 0.0, num_steps + 1)
    x_final, xs = _integrate(model_fn, x, ts, method=method, t_scale=t_scale)
    return (x_final, xs) if return_intermediates else x_final


def flow_reverse_loop(
    model_fn: Callable,
    x,
    *,
    num_steps: int = 50,
    method: str = "heun",
    t_scale: float = 1000.0,
    return_intermediates: bool = False,
):
    """Encode data to noise by integrating the same ODE from t=0 to t=1 —
    the flow analog of `ddim_reverse_sample_loop` (deterministic inversion
    for editing/latent interpolation)."""
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)
    x_final, xs = _integrate(model_fn, x, ts, method=method, t_scale=t_scale)
    return (x_final, xs) if return_intermediates else x_final
