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

import numpy as np

import jax
import jax.numpy as jnp

from . import gaussian
from .schedule import DiffusionSchedule

__all__ = ["p_sample_loop", "ddim_sample_loop", "ddim_reverse_sample_loop",
           "p_sample_loop_cached", "ddim_sample_loop_cached",
           "cache_refresh_mask", "dpm_solver_sample_loop",
           "unipc_sample_loop"]


def _init_noise(shape, noise, rng, dtype):
    if noise is not None:
        return jnp.asarray(noise, dtype=dtype)
    if rng is None:
        raise ValueError("either `noise` or `rng` must be provided")
    # fold_in with an index >= num steps: never collides with per-step keys
    return jax.random.normal(jax.random.fold_in(rng, 2 ** 30), shape, dtype)


def _apply_step(step_kind, sched, model_output, x, t, n, *, clip_denoised,
                denoised_fn, cond_grad, eta):
    """One reverse-process update given the model output (shared by the
    plain and cached loops)."""
    if step_kind == "p":
        return gaussian.p_sample_step(
            sched, model_output, x, t, n,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_grad=cond_grad,
        )
    if step_kind == "ddim":
        return gaussian.ddim_step(
            sched, model_output, x, t, n, eta=eta,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
            cond_grad=cond_grad,
        )
    assert step_kind == "ddim_reverse"
    return gaussian.ddim_reverse_step(
        sched, model_output, x, t,
        clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        cond_grad=cond_grad,
    )


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

    if step_kind == "ddim_reverse":
        idx = jnp.arange(T)          # forward: t = 0 .. T-1
    else:
        idx = jnp.arange(T - 1, -1, -1)  # reverse: t = T-1 .. 0

    if needs_noise and step_noise is None:
        # one bulk vmapped threefry call over the SAME fold_in(rng, i) keys
        # a per-step call would use — bit-identical noise (pinned by the
        # scan-vs-loop and interval=1 exactness tests). Measured
        # performance-neutral at DiT shapes on TPU (XLA already overlaps
        # the in-loop threefry with the model); kept because it removes the
        # serial RNG dependency from the scan body outright.
        step_noise = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(rng, i), shape, dtype))(idx)

    def body(x, scan_in):
        k, i = scan_in  # k: 0..T-1 step counter; i = T-1-k: timestep index
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_model = sched.timestep_map[t]
        model_output = model_fn(x, t_model)
        cond_grad = cond_fn(x, t_model) if cond_fn is not None else None
        n = step_noise[k] if needs_noise else None
        res = _apply_step(step_kind, sched, model_output, x, t, n,
                          clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                          cond_grad=cond_grad, eta=eta)
        ys = res.sample if return_intermediates else None
        return res.sample, ys

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


def cache_refresh_mask(sched: DiffusionSchedule, interval: int,
                       schedule: str = "uniform") -> np.ndarray:
    """(T,) bool mask: which reverse-process steps refresh the layer cache.

    Same refresh BUDGET as FORA's fixed interval — ceil(T / interval) full
    model evaluations — but `schedule` chooses their PLACEMENT:

    - "uniform": every interval-th step (identical to the fixed-k loop).
    - "logsnr": refreshes at equal log-SNR (lambda) spacing — denser where
      the respaced schedule moves fastest through noise levels, i.e. where
      consecutive steps differ most and stale layer outputs hurt most (the
      same nonuniformity principle as TeaCache, arXiv:2411.19108, with a
      schedule-derived signal instead of a model-calibrated one).
    - "abar": equal alpha_bar spacing (densest mid-chain for the linear
      schedule).

    The mask is pure schedule arithmetic (data-independent), so it is a
    compile-time constant: the adaptive loop stays one XLA program with no
    host round-trips. Index 0 (the first, cache-filling step) is always a
    refresh.
    """
    T = sched.num_timesteps
    budget = (T + interval - 1) // interval
    mask = np.zeros(T, dtype=bool)
    if schedule == "uniform":
        mask[::interval] = True
        return mask
    abar = np.asarray(sched.alphas_cumprod, dtype=np.float64)[::-1]  # k-order
    if schedule == "abar":
        delta = np.abs(np.diff(abar, prepend=abar[0]))
    elif schedule == "logsnr":
        lam = 0.5 * (np.log(abar) - np.log1p(-abar))
        delta = np.abs(np.diff(lam, prepend=lam[0]))
    else:
        raise ValueError(f"unknown cache refresh schedule: {schedule!r}")
    cum = np.cumsum(delta)
    total = cum[-1] if cum[-1] > 0 else 1.0
    # refresh wherever the accumulated signal crosses the next of `budget`
    # equally spaced thresholds; when several thresholds land in one step's
    # jump, advance to the next free step so the budget is spent EXACTLY
    # (otherwise a spiky signal silently buys speed by dropping refreshes
    # and the uniform-vs-nonuniform comparison stops being equal-compute)
    thresholds = np.arange(budget) * (total / budget)
    crossed = np.searchsorted(cum, thresholds, side="left")
    last = -1
    for c in crossed:
        pos = max(int(c), last + 1)
        if pos >= T:
            break
        mask[pos] = True
        last = pos
    mask[0] = True
    # a spiky signal can push trailing thresholds past T (e.g. the log-SNR
    # blow-up at t -> 0 stacks many thresholds into the last few steps);
    # spend the leftover budget by splitting the longest unrefreshed runs,
    # so every schedule uses EXACTLY the same number of full evaluations
    while mask.sum() < budget:
        runs = np.split(np.flatnonzero(~mask),
                        np.where(np.diff(np.flatnonzero(~mask)) > 1)[0] + 1)
        longest = max(runs, key=len)
        mask[longest[len(longest) // 2]] = True
    return mask


def _cached_loop_masked(
    step_kind: str,
    model_full_fn: Callable,
    model_cached_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    refresh_mask,
    rng=None,
    noise=None,
    clip_denoised=True,
    denoised_fn=None,
    cond_fn=None,
    eta=0.0,
    dtype=jnp.float32,
):
    """Layer-cached sampling with an ARBITRARY static refresh mask.

    One `lax.scan` over all T steps whose body is a `lax.cond` between the
    full model (refresh) and the cache replay — a scalar-predicate branch,
    so each step executes only the side it takes. Used for the nonuniform
    `cache_refresh_mask` schedules; the uniform case keeps the period-tiled
    `_cached_loop` (equal math, marginally simpler program).
    """
    assert step_kind in ("p", "ddim")
    if noise is not None:
        shape = noise.shape
    x = _init_noise(shape, noise, rng, dtype)
    B = shape[0]
    T = sched.num_timesteps
    refresh_mask = np.asarray(refresh_mask, dtype=bool).copy()
    assert refresh_mask.shape == (T,), (refresh_mask.shape, T)
    refresh_mask[0] = True  # the first step must fill the cache
    needs_noise = step_kind == "p" or eta != 0.0
    if needs_noise and rng is None:
        raise ValueError("stochastic sampling needs `rng`")
    step_noise = None
    if needs_noise:
        step_noise = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(rng, i), shape, dtype))(
                    T - 1 - jnp.arange(T))

    # zero-initialized cache pytree for the scan carry; never read (step 0
    # refreshes before any replay)
    _, cache_shapes = jax.eval_shape(
        model_full_fn,
        jax.ShapeDtypeStruct(shape, dtype),
        jax.ShapeDtypeStruct((B,), jnp.int32),
    )
    cache0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), cache_shapes)

    def body(carry, scan_in):
        x, cache = carry
        k, i, refresh = scan_in
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_model = sched.timestep_map[t]
        model_output, cache = jax.lax.cond(
            refresh,
            lambda args: model_full_fn(args[0], t_model),
            lambda args: (model_cached_fn(args[0], t_model, args[1]), args[1]),
            (x, cache),
        )
        cond_grad = cond_fn(x, t_model) if cond_fn is not None else None
        n = step_noise[k] if needs_noise else None
        res = _apply_step(step_kind, sched, model_output, x, t, n,
                          clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                          cond_grad=cond_grad, eta=eta)
        return (res.sample, cache), None

    ks = jnp.arange(T)
    idx = T - 1 - ks
    (x, _), _ = jax.lax.scan(
        body, (x, cache0), (ks, idx, jnp.asarray(refresh_mask)))
    return x


def _cached_loop(
    step_kind: str,
    model_full_fn: Callable,
    model_cached_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    interval: int,
    rng=None,
    noise=None,
    clip_denoised=True,
    denoised_fn=None,
    cond_fn=None,
    eta=0.0,
    dtype=jnp.float32,
):
    """Sampling loop with a FORA-style layer cache (arXiv:2407.01425).

    Every `interval`-th step runs the full model and refreshes a per-layer
    cache of attention/MLP branch outputs; the steps in between reuse the
    cache through `model_cached_fn`, recomputing only the timestep-dependent
    adaLN gates (~1% of the FLOPs). The k-step period is static, so the loop
    compiles as one `lax.scan` over periods whose body holds 1 full + (k-1)
    cached model calls — no data-dependent branching.

    model_full_fn(x, t)        -> (model_output, cache)
    model_cached_fn(x, t, cache) -> model_output

    `interval=1` is exactly the plain loop (same step math and noise-key
    schedule as `_loop`, equal up to XLA op-reordering). An approximation
    for interval > 1.
    """
    assert step_kind in ("p", "ddim")
    assert interval >= 1
    if noise is not None:
        shape = noise.shape
    x = _init_noise(shape, noise, rng, dtype)
    B = shape[0]
    T = sched.num_timesteps
    k = interval
    needs_noise = step_kind == "p" or eta != 0.0
    if needs_noise and rng is None:
        raise ValueError("stochastic sampling needs `rng`")
    step_noise = None
    if needs_noise:
        # bulk-generate all T per-step noises in one vmapped threefry call
        # (same fold_in(rng, i) keys as per-step calls: bit-identical —
        # see the matching block in _loop)
        step_noise = jax.vmap(
            lambda i: jax.random.normal(
                jax.random.fold_in(rng, i), shape, dtype))(
                    T - 1 - jnp.arange(T))

    def one_step(x, cache, k_step, j):
        """Sub-step j of a period; j == 0 refreshes the cache."""
        i = T - 1 - k_step  # timestep index (reverse order, as in _loop)
        t = jnp.full((B,), i, dtype=jnp.int32)
        t_model = sched.timestep_map[t]
        if j == 0:
            model_output, cache = model_full_fn(x, t_model)
        else:
            model_output = model_cached_fn(x, t_model, cache)
        cond_grad = cond_fn(x, t_model) if cond_fn is not None else None
        n = step_noise[k_step] if needs_noise else None
        res = _apply_step(step_kind, sched, model_output, x, t, n,
                          clip_denoised=clip_denoised, denoised_fn=denoised_fn,
                          cond_grad=cond_grad, eta=eta)
        return res.sample, cache

    n_periods = T // k

    # period 0 runs un-scanned: its first full call materializes the cache
    # pytree the scan carry needs (if T < k, this IS the whole loop)
    cache = None
    head = min(k, T)
    for j in range(head):
        x, cache = one_step(x, cache, j, j)
    steps_done = head

    if n_periods > 1:
        def period(carry, p):
            x, cache = carry
            for j in range(k):
                x, cache = one_step(x, cache, p * k + j, j)
            return (x, cache), None

        (x, cache), _ = jax.lax.scan(
            period, (x, cache), jnp.arange(1, n_periods))
        steps_done = n_periods * k

    # leftover steps when k doesn't divide T (tail period, full-first)
    for j in range(T - steps_done):
        x, cache = one_step(x, cache, steps_done + j, j)
    return x


def p_sample_loop_cached(
    model_full_fn: Callable,
    model_cached_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    interval: int,
    refresh_schedule: str = "uniform",
    force_refresh_mask=None,
    rng: Optional[jax.Array] = None,
    noise=None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    dtype=jnp.float32,
):
    """DDPM ancestral sampling with the FORA layer cache (see _cached_loop).

    `refresh_schedule` != "uniform" keeps the same refresh budget but
    places the full evaluations nonuniformly (`cache_refresh_mask`).
    `force_refresh_mask` ((T,) bool, step order) ORs extra mandatory
    refreshes into the schedule — used by the guidance-interval composition
    to pin a full evaluation at the band-entry step."""
    if refresh_schedule != "uniform" or force_refresh_mask is not None:
        mask = cache_refresh_mask(sched, interval, refresh_schedule)
        if force_refresh_mask is not None:
            mask = mask | np.asarray(force_refresh_mask, dtype=bool)
        return _cached_loop_masked(
            "p", model_full_fn, model_cached_fn, shape, sched,
            refresh_mask=mask,
            rng=rng, noise=noise, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, cond_fn=cond_fn, dtype=dtype,
        )
    return _cached_loop(
        "p", model_full_fn, model_cached_fn, shape, sched, interval=interval,
        rng=rng, noise=noise, clip_denoised=clip_denoised,
        denoised_fn=denoised_fn, cond_fn=cond_fn, dtype=dtype,
    )


def ddim_sample_loop_cached(
    model_full_fn: Callable,
    model_cached_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    interval: int,
    refresh_schedule: str = "uniform",
    force_refresh_mask=None,
    rng: Optional[jax.Array] = None,
    noise=None,
    clip_denoised: bool = True,
    denoised_fn=None,
    cond_fn=None,
    eta: float = 0.0,
    dtype=jnp.float32,
):
    """DDIM sampling with the FORA layer cache (see _cached_loop and
    p_sample_loop_cached's force_refresh_mask)."""
    if refresh_schedule != "uniform" or force_refresh_mask is not None:
        mask = cache_refresh_mask(sched, interval, refresh_schedule)
        if force_refresh_mask is not None:
            mask = mask | np.asarray(force_refresh_mask, dtype=bool)
        return _cached_loop_masked(
            "ddim", model_full_fn, model_cached_fn, shape, sched,
            refresh_mask=mask,
            rng=rng, noise=noise, clip_denoised=clip_denoised,
            denoised_fn=denoised_fn, cond_fn=cond_fn, eta=eta, dtype=dtype,
        )
    return _cached_loop(
        "ddim", model_full_fn, model_cached_fn, shape, sched, interval=interval,
        rng=rng, noise=noise, clip_denoised=clip_denoised,
        denoised_fn=denoised_fn, cond_fn=cond_fn, eta=eta, dtype=dtype,
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


def dpm_solver_sample_loop(
    model_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    rng: Optional[jax.Array] = None,
    noise=None,
    order: int = 2,
    clip_denoised: bool = True,
    denoised_fn=None,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """DPM-Solver++(2M): deterministic second-order multistep sampler
    (Lu et al., arXiv:2211.01095), in the data-prediction (x0)
    parameterization over log-SNR (lambda) space.

    Beyond-reference capability: the reference ships only DDPM ancestral
    and DDIM first-order sampling (`/root/reference/diffusion/
    gaussian_diffusion.py:376,513`). A second-order solver reaches a given
    ODE accuracy in far fewer model calls — the honest-compute fast-sampling
    path (every step still evaluates the full model, unlike the FORA layer
    cache), typically run with 10-25 respaced steps.

    Same contract as the other loops: one `lax.scan` over the respaced
    timesteps, the model is called with original-process timesteps via
    `sched.timestep_map`, `clip_denoised`/`denoised_fn` apply to the x0
    prediction through the same `gaussian.p_mean_variance` path (so
    LEARNED_RANGE outputs and every mean type are handled identically).

    Exactness anchors (tests/test_dpm_solver.py): with `order=1` every
    update reduces algebraically to the eta=0 DDIM step, and the final step
    (to sigma=0) returns the pure x0 prediction — the same endpoint as the
    DDIM loop's t=0 step. `order=2` adds the multistep correction
    `D_bar = (1 + w) x0_k - w x0_{k-1}`, `w = h_k / (2 h_{k-1})`, with
    first-order fallbacks at the first step (no history) and the last step
    (h -> inf; the standard lower-order-final rule).

    Deterministic: `rng`/`noise` only seed x_T.
    """
    assert order in (1, 2), order
    x = _init_noise(shape, noise, rng, dtype)
    B = shape[0]
    T = sched.num_timesteps

    # per-step coefficients in k-order (k = 0..T-1 visits t = T-1..0), with
    # a virtual final target state = clean data (alpha=1, sigma=0), so every
    # quantity below is finite in closed form:
    #   x_{k+1} = (sigma_tgt / sigma_cur) x_k
    #             + alpha_tgt (1 - e^{-h}) D_bar_k
    #   e^{-h}  = (alpha_cur sigma_tgt) / (alpha_tgt sigma_cur)
    abar = sched.alphas_cumprod[::-1].astype(jnp.float32)
    alpha = jnp.sqrt(abar)
    sigma = jnp.sqrt(1.0 - abar)
    lam = 0.5 * (jnp.log(abar) - jnp.log1p(-abar))
    a_tgt = jnp.concatenate([alpha[1:], jnp.ones((1,), jnp.float32)])
    s_tgt = jnp.concatenate([sigma[1:], jnp.zeros((1,), jnp.float32)])
    c_x = s_tgt / sigma                       # 0 at the final step
    e_mh = alpha * s_tgt / (a_tgt * sigma)    # e^{-h}; 0 at the final step
    c_d = a_tgt * (1.0 - e_mh)                # 1 at the final step
    # h_k = lambda_{k+1} - lambda_k; final entry 0 => w[T-1] = 0 (the
    # lower-order-final rule falls out of the encoding)
    h = jnp.concatenate([lam[1:] - lam[:-1], jnp.zeros((1,), jnp.float32)])
    if T > 1:
        w = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                             h[1:] / (2.0 * h[:-1])])
    else:
        w = jnp.zeros((1,), jnp.float32)

    def body(carry, k):
        x, d_prev = carry
        i = T - 1 - k
        t = jnp.full((B,), i, dtype=jnp.int32)
        model_output = model_fn(x, sched.timestep_map[t])
        d = gaussian.p_mean_variance(
            sched, model_output, x, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        ).pred_xstart
        wk = w[k] if order == 2 else jnp.float32(0.0)
        d_bar = (1.0 + wk) * d - wk * d_prev
        x = (c_x[k] * x.astype(jnp.float32)
             + c_d[k] * d_bar.astype(jnp.float32)).astype(dtype)
        ys = x if return_intermediates else None
        return (x, d), ys

    (x, _), intermediates = jax.lax.scan(
        body, (x, jnp.zeros_like(x)), jnp.arange(T))
    if return_intermediates:
        return x, intermediates
    return x


def unipc_sample_loop(
    model_fn: Callable,
    shape,
    sched: DiffusionSchedule,
    *,
    rng: Optional[jax.Array] = None,
    noise=None,
    order: int = 2,
    corrector: bool = True,
    variant: str = "bh2",
    clip_denoised: bool = True,
    denoised_fn=None,
    return_intermediates: bool = False,
    dtype=jnp.float32,
):
    """UniPC: unified predictor-corrector sampler (Zhao et al.,
    arXiv:2302.04867), data-prediction parameterization over log-SNR space.

    Beyond-reference capability (the reference ships DDPM/DDIM only,
    `/root/reference/diffusion/gaussian_diffusion.py:376,513`). UniPC's
    corrector reuses the NEXT step's model evaluation to correct the
    previous update, so it raises the effective solver order at ZERO extra
    model calls — the same honest-compute budget as DPM-Solver++(2M), one
    full model evaluation per respaced step, typically better at <= 10
    steps. `variant` selects the B(h) function: "bh2" (B(h)=expm1(h), the
    paper's recommendation for guided sampling — DiT CFG sampling is
    guided) or "bh1" (B(h)=h).

    Exactness anchors (tests/test_unipc.py): with `corrector=False` and
    variant="bh2" the predictor is ALGEBRAICALLY DPM-Solver++(2M) (the
    UniP-2 simplified rho=1/2 update is the 2M multistep correction), so it
    must match `dpm_solver_sample_loop(order=2)` to float tolerance; with
    `order=1, corrector=False` it is eta=0 DDIM. The corrector is gated off
    on the first step (no history) and after the final step (no further
    model evaluation exists), matching the official sampler.

    Like the other loops: one `lax.scan` over respaced timesteps, model
    called with original-process timesteps via `sched.timestep_map`,
    `clip_denoised`/`denoised_fn` applied to the x0 prediction through
    `gaussian.p_mean_variance`. All transition coefficients are built
    host-side in fp64 from `sched.alphas_cumprod_fp64` and baked into the
    program as (T,) fp32 tables — branchless scan body, no data-dependent
    control flow. Deterministic: `rng`/`noise` only seed x_T.
    """
    assert order in (1, 2), order
    assert variant in ("bh1", "bh2"), variant
    x = _init_noise(shape, noise, rng, dtype)
    B = shape[0]
    T = sched.num_timesteps

    # ---- host-side fp64 coefficient tables (k-order: k = 0..T-1 visits
    # t = T-1..0, with a virtual final state alpha=1, sigma=0) ----
    abar = np.asarray(sched.alphas_cumprod_fp64, np.float64)[::-1]
    alpha = np.sqrt(abar)
    sigma = np.sqrt(1.0 - abar)
    lam = 0.5 * (np.log(abar) - np.log1p(-abar))
    a_tgt = np.append(alpha[1:], 1.0)
    s_tgt = np.append(sigma[1:], 0.0)
    # predictor transition k -> k+1: x' = c_x_p x + A_p m + P_res rho_p D1p
    c_x_p = s_tgt / sigma
    e_mh = alpha * s_tgt / (a_tgt * sigma)        # e^{-h_k}; 0 at final step
    A_p = a_tgt * (1.0 - e_mh)
    h = np.append(lam[1:] - lam[:-1], np.inf)     # h[T-1] = inf (to sigma=0)
    rho_p = np.zeros(T)
    if order == 2 and T >= 3:
        rho_p[1:T - 1] = 0.5                       # lower-order first + final
    # D1p = (m_prev - m) / r0p, r0p = (lam_{k-1} - lam_k)/h_k = -h_{k-1}/h_k
    r0p = np.ones(T)
    if T >= 3:
        r0p[1:T - 1] = -h[0:T - 2] / h[1:T - 1]
    p_res = (A_p if variant == "bh2" else a_tgt * np.where(np.isinf(h), 0.0, h))
    p_res = np.where(rho_p == 0.0, 0.0, p_res)     # kill inf/NaN where unused
    r0p = np.where(rho_p == 0.0, 1.0, r0p)
    # corrector at step k rebuilds state k from state k-1 (transition h_{k-1})
    gate = np.zeros(T)
    if corrector and T >= 2:
        gate[1:] = 1.0
    c_x_c = np.zeros(T)
    A_c = np.zeros(T)
    rc0 = np.zeros(T)
    rc1 = np.zeros(T)
    r0c = np.ones(T)
    for k in range(1, T):
        hc = h[k - 1]
        c_x_c[k] = sigma[k] / sigma[k - 1]
        A_c[k] = alpha[k] * -np.expm1(-hc)
        if k == 1 or order == 1:
            rc1[k] = 0.5                           # simplified order-1 UniC
            continue
        hh = -hc
        phi1 = np.expm1(hh)
        b_h = phi1 if variant == "bh2" else hh
        b1 = (phi1 / hh - 1.0) / b_h
        b2 = 2.0 * ((phi1 / hh - 1.0) / hh - 0.5) / b_h
        r0c[k] = -h[k - 2] / h[k - 1]
        rc0[k] = (b1 - b2) / (1.0 - r0c[k])
        rc1[k] = b1 - rc0[k]
    tab = {name: jnp.asarray(v, jnp.float32) for name, v in dict(
        c_x_p=c_x_p, A_p=A_p, rho_p=rho_p, r0p=r0p, p_res=p_res, gate=gate,
        c_x_c=c_x_c, A_c=A_c, rc0=rc0, rc1=rc1, r0c=r0c).items()}

    def pred_x0(x, t):
        model_output = model_fn(x, sched.timestep_map[t])
        return gaussian.p_mean_variance(
            sched, model_output, x, t,
            clip_denoised=clip_denoised, denoised_fn=denoised_fn,
        ).pred_xstart.astype(jnp.float32)

    def body(carry, k):
        x, x_prev, m_prev, m_prev2 = carry
        i = T - 1 - k
        t = jnp.full((B,), i, dtype=jnp.int32)
        m = pred_x0(x, t)
        # UniC: correct the k-1 -> k transition with the fresh evaluation m
        # (computed at the PREDICTED x — the official zero-extra-NFE rule)
        d1c0 = (m_prev2 - m_prev) / tab["r0c"][k]
        d1ct = m - m_prev
        x_corr = (tab["c_x_c"][k] * x_prev
                  + tab["A_c"][k] * (m_prev + tab["rc0"][k] * d1c0
                                     + tab["rc1"][k] * d1ct))
        x32 = x.astype(jnp.float32)
        x_used = tab["gate"][k] * x_corr + (1.0 - tab["gate"][k]) * x32
        # UniP: predict the k -> k+1 transition
        d1p = (m_prev - m) / tab["r0p"][k]
        x_next = (tab["c_x_p"][k] * x_used + tab["A_p"][k] * m
                  + tab["p_res"][k] * tab["rho_p"][k] * d1p).astype(dtype)
        ys = x_next if return_intermediates else None
        return (x_next, x_used.astype(dtype), m, m_prev), ys

    zeros = jnp.zeros(shape, jnp.float32)
    (x, _, _, _), intermediates = jax.lax.scan(
        body, (x, jnp.zeros_like(x), zeros, zeros), jnp.arange(T))
    if return_intermediates:
        return x, intermediates
    return x
