"""Gaussian-diffusion math as pure functions of a `DiffusionSchedule`.

Capability parity with `/root/reference/diffusion/gaussian_diffusion.py`
(q/p distributions :203-332, prediction helpers :334-344, classifier guidance
:346-374, single steps :376-417/:513-598, VLB terms :682-713, training losses
:715-787, bpd :789-858) and `/root/reference/diffusion/diffusion_utils.py`
(normal KL :10, discretized Gaussian log-likelihood :62).

TPU-first redesign notes:
- Every function is stateless: it takes the frozen `DiffusionSchedule` pytree
  plus arrays, so it can be jitted, vmapped, scanned, and sharded freely.
- Functions that the reference expressed as "call the model inside" instead
  take the *model output*, so the caller controls where the model forward
  lives (e.g. fused into a `lax.scan` sampling chain — see `sampling.py`).
- The reference's `detach()` frozen-mean trick in the hybrid VB loss
  (gaussian_diffusion.py:758) maps to `lax.stop_gradient`.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule, LossType, MeanType, VarType

__all__ = [
    "mean_flat",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "continuous_gaussian_log_likelihood",
    "extract",
    "q_mean_variance",
    "q_sample",
    "q_posterior_mean_variance",
    "PMeanVariance",
    "p_mean_variance",
    "predict_xstart_from_eps",
    "predict_eps_from_xstart",
    "condition_mean",
    "condition_score",
    "StepResult",
    "p_sample_step",
    "ddim_step",
    "ddim_reverse_step",
    "vb_terms_bpd",
    "training_losses",
    "prior_bpd",
    "calc_bpd_loop",
]


# ---------------------------------------------------------------------------
# Small math utilities (reference diffusion_utils.py)
# ---------------------------------------------------------------------------

def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions (reference gaussian_diffusion.py:16-20)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal Gaussians (reference diffusion_utils.py:10-36)."""
    logvar1 = jnp.asarray(logvar1, dtype=jnp.result_type(float))
    logvar2 = jnp.asarray(logvar2, dtype=jnp.result_type(float))
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """tanh-based CDF approximation (reference diffusion_utils.py:39-44)."""
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def continuous_gaussian_log_likelihood(x, *, means, log_scales):
    """Continuous Gaussian log-likelihood (reference diffusion_utils.py:47-59)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    normalized_x = centered_x * inv_stdv
    # log N(z; 0, 1)
    return -0.5 * (normalized_x ** 2 + np.log(2 * np.pi))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to uint8 bins scaled to [-1, 1]
    (reference diffusion_utils.py:62-88)."""
    assert x.shape == means.shape == log_scales.shape
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min, jnp.log(jnp.clip(cdf_delta, min=1e-12))),
    )
    return log_probs


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int, dtype=None) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast to `ndim` dims
    (reference `_extract_into_tensor`, gaussian_diffusion.py:861-873)."""
    out = table[t]
    if dtype is not None:
        out = out.astype(dtype)
    return out.reshape(t.shape[0], *((1,) * (ndim - 1)))


# ---------------------------------------------------------------------------
# q distributions
# ---------------------------------------------------------------------------

def q_mean_variance(sched: DiffusionSchedule, x_start, t):
    """q(x_t | x_0) moments (reference gaussian_diffusion.py:203-213)."""
    nd = x_start.ndim
    mean = extract(sched.sqrt_alphas_cumprod, t, nd, x_start.dtype) * x_start
    variance = extract(1.0 - sched.alphas_cumprod, t, nd, x_start.dtype)
    log_variance = extract(sched.log_one_minus_alphas_cumprod, t, nd, x_start.dtype)
    return mean, variance, log_variance


def q_sample(sched: DiffusionSchedule, x_start, t, noise):
    """Sample from q(x_t | x_0) (reference gaussian_diffusion.py:215-230)."""
    assert noise.shape == x_start.shape
    nd = x_start.ndim
    return (
        extract(sched.sqrt_alphas_cumprod, t, nd, x_start.dtype) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t, nd, x_start.dtype) * noise
    )


def q_posterior_mean_variance(sched: DiffusionSchedule, x_start, x_t, t):
    """q(x_{t-1} | x_t, x_0) moments (reference gaussian_diffusion.py:232-252)."""
    assert x_start.shape == x_t.shape
    nd = x_t.ndim
    posterior_mean = (
        extract(sched.posterior_mean_coef1, t, nd, x_t.dtype) * x_start
        + extract(sched.posterior_mean_coef2, t, nd, x_t.dtype) * x_t
    )
    posterior_variance = extract(sched.posterior_variance, t, nd, x_t.dtype)
    posterior_log_variance = extract(sched.posterior_log_variance_clipped, t, nd, x_t.dtype)
    return posterior_mean, posterior_variance, posterior_log_variance


# ---------------------------------------------------------------------------
# p distribution from a model output
# ---------------------------------------------------------------------------

class PMeanVariance(NamedTuple):
    mean: jnp.ndarray
    variance: jnp.ndarray
    log_variance: jnp.ndarray
    pred_xstart: jnp.ndarray


def predict_xstart_from_eps(sched: DiffusionSchedule, x_t, t, eps):
    """(reference gaussian_diffusion.py:334-339)"""
    assert x_t.shape == eps.shape
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd, x_t.dtype) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t, nd, x_t.dtype) * eps
    )


def predict_eps_from_xstart(sched: DiffusionSchedule, x_t, t, pred_xstart):
    """(reference gaussian_diffusion.py:341-344)"""
    nd = x_t.ndim
    return (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd, x_t.dtype) * x_t - pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd, x_t.dtype)


def p_mean_variance(
    sched: DiffusionSchedule,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    *,
    clip_denoised: bool = True,
    denoised_fn: Optional[Callable] = None,
) -> PMeanVariance:
    """p(x_{t-1} | x_t) moments and the x_0 prediction, from a model OUTPUT.

    Semantics of reference gaussian_diffusion.py:254-332, including the
    LEARNED_RANGE channel split at :285-293 and the quirk that a PREVIOUS_X
    mean type still routes through the epsilon parameterization (:317-322).
    The channel axis is axis 1 (NCHW contract).
    """
    B, C = x.shape[:2]
    nd = x.ndim

    if sched.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
        assert model_output.shape == (B, C * 2, *x.shape[2:])
        model_output, model_var_values = jnp.split(model_output, 2, axis=1)
        if sched.var_type == VarType.LEARNED:
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = extract(sched.posterior_log_variance_clipped, t, nd, x.dtype)
            max_log = extract(sched.log_betas, t, nd, x.dtype)
            # model_var_values is in [-1, 1] for [min_var, max_var]
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    else:
        if sched.var_type == VarType.FIXED_LARGE:
            model_variance = extract(sched.fixed_large_variance, t, nd, x.dtype)
            model_log_variance = extract(sched.log_fixed_large_variance, t, nd, x.dtype)
        elif sched.var_type == VarType.FIXED_SMALL:
            model_variance = extract(sched.posterior_variance, t, nd, x.dtype)
            model_log_variance = extract(sched.posterior_log_variance_clipped, t, nd, x.dtype)
        else:
            raise NotImplementedError(sched.var_type)
        model_variance = jnp.broadcast_to(model_variance, x.shape)
        model_log_variance = jnp.broadcast_to(model_log_variance, x.shape)

    def process_xstart(x0):
        if denoised_fn is not None:
            x0 = denoised_fn(x0)
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        return x0

    if sched.mean_type == MeanType.START_X:
        pred_xstart = process_xstart(model_output)
    else:
        pred_xstart = process_xstart(predict_xstart_from_eps(sched, x, t, model_output))
    model_mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)

    assert model_mean.shape == pred_xstart.shape == x.shape
    return PMeanVariance(model_mean, model_variance, model_log_variance, pred_xstart)


# ---------------------------------------------------------------------------
# Classifier guidance (reference gaussian_diffusion.py:346-374)
# ---------------------------------------------------------------------------

def condition_mean(sched: DiffusionSchedule, cond_grad, out: PMeanVariance) -> PMeanVariance:
    """Shift the mean by variance * grad(log p(y|x)) (Sohl-Dickstein et al.)."""
    new_mean = out.mean.astype(jnp.float32) + out.variance * cond_grad.astype(jnp.float32)
    return out._replace(mean=new_mean)


def condition_score(sched: DiffusionSchedule, cond_grad, out: PMeanVariance, x, t) -> PMeanVariance:
    """Condition the score function (Song et al. 2020)."""
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd, x.dtype)
    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    eps = eps - jnp.sqrt(1 - alpha_bar) * cond_grad
    pred_xstart = predict_xstart_from_eps(sched, x, t, eps)
    mean, _, _ = q_posterior_mean_variance(sched, pred_xstart, x, t)
    return out._replace(mean=mean, pred_xstart=pred_xstart)


# ---------------------------------------------------------------------------
# Single reverse-process steps
# ---------------------------------------------------------------------------

class StepResult(NamedTuple):
    sample: jnp.ndarray
    pred_xstart: jnp.ndarray


def _nonzero_mask(t, ndim, dtype):
    """1.0 where t != 0, broadcastable; no noise is added at t == 0."""
    return (t != 0).astype(dtype).reshape(-1, *((1,) * (ndim - 1)))


def p_sample_step(
    sched: DiffusionSchedule,
    model_output,
    x,
    t,
    noise,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_grad=None,
) -> StepResult:
    """One DDPM ancestral step x_t -> x_{t-1} (reference gaussian_diffusion.py:376-417)."""
    out = p_mean_variance(
        sched, model_output, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
    )
    if cond_grad is not None:
        out = condition_mean(sched, cond_grad, out)
    mask = _nonzero_mask(t, x.ndim, x.dtype)
    sample = out.mean + mask * jnp.exp(0.5 * out.log_variance) * noise
    return StepResult(sample, out.pred_xstart)


def ddim_step(
    sched: DiffusionSchedule,
    model_output,
    x,
    t,
    noise=None,
    *,
    eta: float = 0.0,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_grad=None,
) -> StepResult:
    """One DDIM step (Eq. 12) (reference gaussian_diffusion.py:513-560)."""
    out = p_mean_variance(
        sched, model_output, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
    )
    if cond_grad is not None:
        out = condition_score(sched, cond_grad, out, x, t)

    eps = predict_eps_from_xstart(sched, x, t, out.pred_xstart)
    nd = x.ndim
    alpha_bar = extract(sched.alphas_cumprod, t, nd, x.dtype)
    alpha_bar_prev = extract(sched.alphas_cumprod_prev, t, nd, x.dtype)
    sigma = (
        eta
        * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
        * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
    )
    mean_pred = (
        out.pred_xstart * jnp.sqrt(alpha_bar_prev)
        + jnp.sqrt(1 - alpha_bar_prev - sigma ** 2) * eps
    )
    if eta == 0.0 or noise is None:
        sample = mean_pred
    else:
        mask = _nonzero_mask(t, nd, x.dtype)
        sample = mean_pred + mask * sigma * noise
    return StepResult(sample, out.pred_xstart)


def ddim_reverse_step(
    sched: DiffusionSchedule,
    model_output,
    x,
    t,
    *,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_grad=None,
) -> StepResult:
    """One DDIM reverse-ODE step x_t -> x_{t+1} (reference gaussian_diffusion.py:562-598)."""
    out = p_mean_variance(
        sched, model_output, x, t, clip_denoised=clip_denoised, denoised_fn=denoised_fn
    )
    if cond_grad is not None:
        out = condition_score(sched, cond_grad, out, x, t)
    nd = x.ndim
    eps = (
        extract(sched.sqrt_recip_alphas_cumprod, t, nd, x.dtype) * x - out.pred_xstart
    ) / extract(sched.sqrt_recipm1_alphas_cumprod, t, nd, x.dtype)
    alpha_bar_next = extract(sched.alphas_cumprod_next, t, nd, x.dtype)
    mean_pred = out.pred_xstart * jnp.sqrt(alpha_bar_next) + jnp.sqrt(1 - alpha_bar_next) * eps
    return StepResult(mean_pred, out.pred_xstart)


# ---------------------------------------------------------------------------
# Variational bound and training losses
# ---------------------------------------------------------------------------

def vb_terms_bpd(
    sched: DiffusionSchedule,
    model_output,
    x_start,
    x_t,
    t,
    *,
    clip_denoised: bool = True,
):
    """Per-example VLB term in bits (reference gaussian_diffusion.py:682-713).

    Returns (output[N], pred_xstart).
    """
    true_mean, _, true_log_variance_clipped = q_posterior_mean_variance(sched, x_start, x_t, t)
    out = p_mean_variance(sched, model_output, x_t, t, clip_denoised=clip_denoised)
    kl = normal_kl(true_mean, true_log_variance_clipped, out.mean, out.log_variance)
    kl = mean_flat(kl) / np.log(2.0)

    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out.mean, log_scales=0.5 * out.log_variance
    )
    decoder_nll = mean_flat(decoder_nll) / np.log(2.0)

    # At t == 0 return the decoder NLL, else KL(q(x_{t-1}|x_t,x_0) || p).
    output = jnp.where(t == 0, decoder_nll, kl)
    return output, out.pred_xstart


def training_losses(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    map_timesteps: bool = True,
) -> dict:
    """Per-example training losses (reference gaussian_diffusion.py:715-787).

    `model_fn(x_t, t_model)` is called once; `t` is in respaced index space
    and is mapped through `schedule.timestep_map` before the model sees it
    (reference respace.py:124-129). The hybrid MSE+VB loss freezes the mean
    prediction inside the VB term via `stop_gradient`
    (reference gaussian_diffusion.py:758).
    """
    assert noise.shape == x_start.shape
    x_t = q_sample(sched, x_start, t, noise)
    t_model = sched.timestep_map[t] if map_timesteps else t

    terms = {}
    if sched.loss_type in (LossType.KL, LossType.RESCALED_KL):
        model_output = model_fn(x_t, t_model)
        output, _ = vb_terms_bpd(sched, model_output, x_start, x_t, t, clip_denoised=False)
        terms["loss"] = output
        if sched.loss_type == LossType.RESCALED_KL:
            terms["loss"] = terms["loss"] * sched.num_timesteps
    elif sched.loss_type in (LossType.MSE, LossType.RESCALED_MSE):
        model_output = model_fn(x_t, t_model)
        if sched.var_type in (VarType.LEARNED, VarType.LEARNED_RANGE):
            B, C = x_t.shape[:2]
            assert model_output.shape == (B, C * 2, *x_t.shape[2:])
            model_output, model_var_values = jnp.split(model_output, 2, axis=1)
            # Learn variance with the VLB, without letting it affect the mean.
            frozen_out = jnp.concatenate(
                [jax.lax.stop_gradient(model_output), model_var_values], axis=1
            )
            vb, _ = vb_terms_bpd(sched, frozen_out, x_start, x_t, t, clip_denoised=False)
            if sched.loss_type == LossType.RESCALED_MSE:
                # Divide by 1000 for equivalence with the initial implementation.
                vb = vb * (sched.num_timesteps / 1000.0)
            terms["vb"] = vb

        if sched.mean_type == MeanType.PREVIOUS_X:
            target = q_posterior_mean_variance(sched, x_start, x_t, t)[0]
        elif sched.mean_type == MeanType.START_X:
            target = x_start
        elif sched.mean_type == MeanType.EPSILON:
            target = noise
        else:
            raise NotImplementedError(sched.mean_type)
        assert model_output.shape == target.shape == x_start.shape
        terms["mse"] = mean_flat((target - model_output) ** 2)
        terms["loss"] = terms["mse"] + terms["vb"] if "vb" in terms else terms["mse"]
    else:
        raise NotImplementedError(sched.loss_type)
    return terms


def prior_bpd(sched: DiffusionSchedule, x_start) -> jnp.ndarray:
    """Prior KL term in bits-per-dim (reference gaussian_diffusion.py:789-803)."""
    B = x_start.shape[0]
    t = jnp.full((B,), sched.num_timesteps - 1, dtype=jnp.int32)
    qt_mean, _, qt_log_variance = q_mean_variance(sched, x_start, t)
    kl_prior = normal_kl(qt_mean, qt_log_variance, 0.0, 0.0)
    return mean_flat(kl_prior) / np.log(2.0)


def calc_bpd_loop(
    sched: DiffusionSchedule,
    model_fn: Callable,
    x_start: jnp.ndarray,
    rng: jax.Array,
    *,
    clip_denoised: bool = True,
    map_timesteps: bool = True,
) -> dict:
    """Full VLB in bits-per-dim via one `lax.scan` over timesteps
    (reference gaussian_diffusion.py:805-858, which uses a Python loop).

    Output columns are ordered t = T-1 ... 0, matching the reference's
    append-then-stack ordering.
    """
    B = x_start.shape[0]

    def body(carry, i):
        t = jnp.full((B,), i, dtype=jnp.int32)
        noise = jax.random.normal(jax.random.fold_in(rng, i), x_start.shape, x_start.dtype)
        x_t = q_sample(sched, x_start, t, noise)
        t_model = sched.timestep_map[t] if map_timesteps else t
        model_output = model_fn(x_t, t_model)
        vb, pred_xstart = vb_terms_bpd(
            sched, model_output, x_start, x_t, t, clip_denoised=clip_denoised
        )
        xstart_mse = mean_flat((pred_xstart - x_start) ** 2)
        eps = predict_eps_from_xstart(sched, x_t, t, pred_xstart)
        mse = mean_flat((eps - noise) ** 2)
        return carry, (vb, xstart_mse, mse)

    ts = jnp.arange(sched.num_timesteps - 1, -1, -1)
    _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, ts)
    vb = jnp.transpose(vb)            # (N, T), columns t = T-1..0
    xstart_mse = jnp.transpose(xstart_mse)
    mse = jnp.transpose(mse)
    prior = prior_bpd(sched, x_start)
    total_bpd = vb.sum(axis=1) + prior
    return {
        "total_bpd": total_bpd,
        "prior_bpd": prior,
        "vb": vb,
        "xstart_mse": xstart_mse,
        "mse": mse,
    }
