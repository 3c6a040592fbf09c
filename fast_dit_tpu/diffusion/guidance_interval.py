"""Guidance interval: apply CFG only where it helps, halve compute elsewhere.

The reference runs the doubled-batch CFG forward at EVERY step
(`/root/reference/sample.py:55-60`, `models_original.py:250-266`) — 2x model
compute for the whole chain. Kynkaanniemi et al. (arXiv:2404.07724) showed
guidance only improves samples in a middle band of noise levels: at high
sigma it distorts the large-scale layout, at low sigma it's spent on
imperceptible detail. Restricting CFG to a sigma interval both IMPROVES
FID and cuts compute — outside the interval only the conditional half runs.

TPU formulation: whether a step guides is pure schedule arithmetic, so the
per-original-timestep decision is a compile-time boolean table; the sampler
body stays one `lax.scan` whose step is a scalar-predicate `lax.cond`
between the doubled-batch CFG forward and a half-batch conditional forward
(both shapes static — XLA executes only the taken side per step).

Composes with ddpm/ddim/dpm sampling, and — via
`guidance_interval_cached_fns` — with the FORA layer cache: the cache
pytree keeps the CFG-doubled batch everywhere (static shapes for the scan
carry); out-of-band steps run/read only the conditional half and the
band-entry step is statically forced to be a cache refresh so the
unconditional half is never read stale.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from .schedule import DiffusionSchedule

__all__ = ["guidance_interval_mask", "guidance_interval_fn",
           "guided_steps_korder", "guidance_interval_cached_fns"]


def guidance_interval_mask(sched: DiffusionSchedule, sigma_low: float,
                           sigma_high: float) -> np.ndarray:
    """Boolean table over ORIGINAL-process timesteps: True where the EDM
    noise level sigma(t) = sqrt((1-abar)/abar) lies in [sigma_low,
    sigma_high].

    Indexed by the `t_model` values the sampling loops pass to the model
    (`sched.timestep_map[t]`), so it works with any respacing: the respaced
    abar at step k equals the original abar at timestep_map[k] by the
    respacing contract (respace.py).
    """
    tm = np.asarray(sched.timestep_map, dtype=np.int64)
    # prefer the full-precision host tables: sigma from the fp32-rounded
    # device table can flip a step whose true fp64 sigma sits exactly on a
    # band edge, making the guided-step count precision-dependent
    if getattr(sched, "alphas_cumprod_fp64", None) is not None:
        abar = np.asarray(sched.alphas_cumprod_fp64, dtype=np.float64)
    else:
        abar = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    sigma = np.sqrt((1.0 - abar) / abar)
    in_band = (sigma >= sigma_low) & (sigma <= sigma_high)
    table = np.zeros(int(tm.max()) + 1, dtype=bool)
    table[tm] = in_band
    return table


def guidance_interval_fn(cfg_fn: Callable, cond_fn: Callable,
                         sched: DiffusionSchedule, sigma_low: float,
                         sigma_high: float) -> Callable:
    """Wrap a doubled-batch CFG model into an interval-guided one.

    cfg_fn(x, t):  the usual `forward_with_cfg` doubled-batch forward —
        x is (2B, ...) = [cond ; mirrored], output (2B, ...).
    cond_fn(x, t): the plain conditional forward on a HALF batch (B, ...)
        with the conditional labels.

    Returns model_fn(x, t) with the cfg_fn contract: inside the sigma band
    it calls cfg_fn; outside it evaluates only the conditional half (half
    the FLOPs) and mirrors the output — valid because forward_with_cfg
    itself only ever reads x[:B] and emits mirrored eps, so the second half
    of the state is write-only throughout the chain.

    REQUIREMENT: every entry of `t` must be equal (one scalar step
    broadcast over the batch — true for all in-repo sampling loops). The
    guide/skip decision is taken from t[0] and applied to the whole batch;
    a caller with genuinely per-sample timesteps would silently get sample
    0's decision for everyone.
    """
    table = jnp.asarray(guidance_interval_mask(sched, sigma_low, sigma_high))

    def model_fn(x, t):
        B = x.shape[0] // 2

        def guided(x):
            return cfg_fn(x, t)

        def unguided(x):
            out = cond_fn(x[:B], t[:B])
            return jnp.concatenate([out, out], axis=0)

        # all entries of t are equal (the loops broadcast one scalar step)
        return jax.lax.cond(table[t[0]], guided, unguided, x)

    return model_fn


def guided_steps_korder(sched: DiffusionSchedule, sigma_low: float,
                        sigma_high: float) -> np.ndarray:
    """(T,) bool in SAMPLER STEP order (k = 0 visits t = T-1): which steps
    of the reverse chain are guided. Sigma is monotone in t, so this is one
    contiguous True segment."""
    table = guidance_interval_mask(sched, sigma_low, sigma_high)
    tm = np.asarray(sched.timestep_map, dtype=np.int64)
    return table[tm[::-1]]


def guidance_interval_cached_fns(cfg_fn: Callable, cond_fn: Callable,
                                 sched: DiffusionSchedule, sigma_low: float,
                                 sigma_high: float):
    """Compose the guidance interval with the FORA layer cache.

    cfg_fn(x, t, *, cache=None, want_cache=False): the doubled-batch CFG
        forward (`DiT.forward_with_cfg` semantics) supporting the cache
        protocol — x is (2B, ...).
    cond_fn(x, t, *, cache=None, want_cache=False): the plain conditional
        forward on a HALF batch (B, ...) with the conditional labels.

    Returns (model_full_fn, model_cached_fn, forced_refresh_korder) for the
    cached sampling loops (`p_sample_loop_cached(force_refresh_mask=...)`).

    Cache convention: every cache leaf keeps the FULL doubled batch on
    axis 1 (the nn.scan layer axis is 0), so the scan carry has one static
    shape. In-band steps use both halves; out-of-band steps evaluate only
    the conditional half — a refresh mirrors its half-cache into both
    halves (the uncond half is then stale-by-construction), and a cached
    step reads only `cache[:, :B]`. The stale uncond half can never be
    READ: `forced_refresh_korder` marks the band-entry step, so the first
    guided step after any unguided segment always does a full doubled-batch
    refresh. Requires uniform t per call (see `guidance_interval_fn`).
    """
    table = jnp.asarray(guidance_interval_mask(sched, sigma_low, sigma_high))

    def _mirror(tree):
        return jax.tree.map(lambda a: jnp.concatenate([a, a], axis=1), tree)

    def _cond_half(tree):
        return jax.tree.map(lambda a: a[:, : a.shape[1] // 2], tree)

    def model_full_fn(x, t):
        B = x.shape[0] // 2

        def guided(x):
            return cfg_fn(x, t, want_cache=True)

        def unguided(x):
            out, half_cache = cond_fn(x[:B], t[:B], want_cache=True)
            return (jnp.concatenate([out, out], axis=0), _mirror(half_cache))

        return jax.lax.cond(table[t[0]], guided, unguided, x)

    def model_cached_fn(x, t, cache):
        B = x.shape[0] // 2

        def guided(args):
            x, cache = args
            return cfg_fn(x, t, cache=cache)

        def unguided(args):
            x, cache = args
            out = cond_fn(x[:B], t[:B], cache=_cond_half(cache))
            return jnp.concatenate([out, out], axis=0)

        return jax.lax.cond(table[t[0]], guided, unguided, (x, cache))

    g = guided_steps_korder(sched, sigma_low, sigma_high)
    forced = g & ~np.concatenate([[False], g[:-1]])
    return model_full_fn, model_cached_fn, forced
