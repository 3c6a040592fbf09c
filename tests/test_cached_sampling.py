"""FORA-style layer-cached sampling (diffusion/sampling.py `_cached_loop`,
models/dit.py cache kwargs).

Contracts:
- `interval=1` is the plain sampler (same step math, same noise keys;
  equal up to XLA op-reordering between the two loop structures) — not an
  approximation.
- a cached step with an UNCHANGED (x, t) equals the full block output
  (the cache holds exactly the attention/MLP branch outputs).
- `interval=k` matches a hand-rolled python reference that calls the
  model's full/cached methods step by step — pinning the period pattern
  (full at positions 0, k, 2k, ... and the tail's leading full step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import create_diffusion
from fast_dit_tpu.models import DiT


@pytest.fixture(scope="module")
def small_model():
    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=64,
                depth=3, num_heads=4, num_classes=10, attn_backend="einsum")
    x = jnp.zeros((2, 4, 8, 8))
    params = model.init({"params": jax.random.PRNGKey(0)}, x,
                        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32))
    return model, params


def fns(model, params, y):
    apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
    return (lambda x, t: apply(x, t, want_cache=True),
            lambda x, t, cache: apply(x, t, cache=cache))


def test_block_cache_roundtrip(small_model):
    """full_step's cache fed back into cached_step reproduces the full
    output for the same (x, c) — the cache IS the branch outputs."""
    model, params = small_model
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.array([3, 7])
    y = jnp.array([1, 2])
    out_full, cache = model.apply(params, x, t, y, want_cache=True)
    out_cached = model.apply(params, x, t, y, cache=cache)
    np.testing.assert_allclose(np.asarray(out_cached), np.asarray(out_full),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_interval_one_is_exact(small_model, sampler):
    model, params = small_model
    diffusion = create_diffusion("50")
    y = jnp.array([1, 2])
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    rng = jax.random.PRNGKey(3)
    full_fn, cached_fn = fns(model, params, y)
    plain_loop = (diffusion.p_sample_loop if sampler == "ddpm"
                  else diffusion.ddim_sample_loop)
    cached_loop = (diffusion.p_sample_loop_cached if sampler == "ddpm"
                   else diffusion.ddim_sample_loop_cached)
    ref = plain_loop(lambda x, t: model.apply(params, x, t, y), z.shape,
                     noise=z, rng=rng, clip_denoised=False)
    got = cached_loop(full_fn, cached_fn, z.shape, interval=1, noise=z,
                      rng=rng, clip_denoised=False)
    # same step math and noise-key schedule; the two programs compile with
    # different loop structures, so allow XLA op-reordering ulps
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("steps,interval", [(12, 3), (10, 4), (7, 10)])
def test_matches_python_reference(small_model, steps, interval):
    """Period pattern: the scan-compiled cached loop equals a per-step
    python loop calling the same full/cached model fns (incl. the tail
    when interval doesn't divide T, and interval > T)."""
    from fast_dit_tpu.diffusion import gaussian

    model, params = small_model
    diffusion = create_diffusion(str(steps))
    sched = diffusion.schedule
    y = jnp.array([1, 2])
    z = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 8, 8))
    rng = jax.random.PRNGKey(5)
    full_fn, cached_fn = fns(model, params, y)

    got = diffusion.p_sample_loop_cached(
        full_fn, cached_fn, z.shape, interval=interval, noise=z, rng=rng,
        clip_denoised=False)

    # hand-rolled reference
    T = sched.num_timesteps
    x, cache = jnp.asarray(z), None
    for k_step in range(T):
        i = T - 1 - k_step
        t = jnp.full((2,), i, jnp.int32)
        t_model = sched.timestep_map[t]
        if k_step % interval == 0:
            out, cache = full_fn(x, t_model)
        else:
            out = cached_fn(x, t_model, cache)
        n = jax.random.normal(jax.random.fold_in(rng, i), z.shape, jnp.float32)
        x = gaussian.p_sample_step(sched, out, x, t, n,
                                   clip_denoised=False).sample
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-5, atol=2e-5)


def test_cached_cfg_loop_runs(small_model):
    """CFG + cache integration: doubled batch, finite output."""
    model, params = small_model
    diffusion = create_diffusion("8")
    y = jnp.array([1, 2, 10, 10])
    z = jax.random.normal(jax.random.PRNGKey(6), (4, 4, 8, 8))
    apply = lambda x, t, **kw: model.apply(
        params, x, t, y, method=model.forward_with_cfg, cfg_scale=1.5, **kw)
    out = diffusion.p_sample_loop_cached(
        lambda x, t: apply(x, t, want_cache=True),
        lambda x, t, cache: apply(x, t, cache=cache),
        z.shape, interval=2, noise=z, rng=jax.random.PRNGKey(7),
        clip_denoised=False)
    assert out.shape == z.shape
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# nonuniform refresh placement (sampling.cache_refresh_mask + masked loop)
# ---------------------------------------------------------------------------

def test_refresh_mask_budget_and_first_step():
    from fast_dit_tpu.diffusion.sampling import cache_refresh_mask

    sched = create_diffusion("50").schedule
    for schedule in ("uniform", "logsnr", "abar"):
        for interval in (2, 3, 4):
            mask = cache_refresh_mask(sched, interval, schedule)
            budget = -(-50 // interval)
            assert mask.shape == (50,)
            assert mask[0], (schedule, interval)
            # every schedule spends EXACTLY the same budget of full evals
            assert mask.sum() == budget, (schedule, interval, mask.sum())
    # nonuniform schedules must actually differ from uniform at k=4
    u = cache_refresh_mask(sched, 4, "uniform")
    l = cache_refresh_mask(sched, 4, "logsnr")
    assert (u != l).any()


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_masked_loop_with_uniform_mask_matches_interval_loop(small_model,
                                                             sampler):
    """The lax.cond masked loop under a uniform mask must equal the
    period-tiled interval loop — pinning the branch machinery against the
    already-pinned implementation."""
    from fast_dit_tpu.diffusion.sampling import (_cached_loop_masked,
                                                 cache_refresh_mask)

    model, params = small_model
    diffusion = create_diffusion("12")
    sched = diffusion.schedule
    y = jnp.array([1, 2])
    z = jax.random.normal(jax.random.PRNGKey(8), (2, 4, 8, 8))
    rng = jax.random.PRNGKey(9)
    full_fn, cached_fn = fns(model, params, y)
    cached_loop = (diffusion.p_sample_loop_cached if sampler == "ddpm"
                   else diffusion.ddim_sample_loop_cached)
    ref = cached_loop(full_fn, cached_fn, z.shape, interval=3, noise=z,
                      rng=rng, clip_denoised=False)
    kind = "p" if sampler == "ddpm" else "ddim"
    got = _cached_loop_masked(
        kind, full_fn, cached_fn, z.shape, sched,
        refresh_mask=cache_refresh_mask(sched, 3, "uniform"),
        noise=z, rng=rng, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_masked_loop_all_true_is_plain_loop(small_model):
    import numpy as onp

    from fast_dit_tpu.diffusion.sampling import _cached_loop_masked

    model, params = small_model
    diffusion = create_diffusion("8")
    y = jnp.array([1, 2])
    z = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 8, 8))
    rng = jax.random.PRNGKey(11)
    full_fn, cached_fn = fns(model, params, y)
    ref = diffusion.p_sample_loop(lambda x, t: model.apply(params, x, t, y),
                                  z.shape, noise=z, rng=rng,
                                  clip_denoised=False)
    got = _cached_loop_masked(
        "p", full_fn, cached_fn, z.shape, diffusion.schedule,
        refresh_mask=onp.ones(8, bool), noise=z, rng=rng,
        clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_masked_loop_matches_python_reference(small_model):
    """Arbitrary mask == hand-rolled python loop taking the same branches."""
    import numpy as onp

    from fast_dit_tpu.diffusion import gaussian
    from fast_dit_tpu.diffusion.sampling import _cached_loop_masked

    model, params = small_model
    diffusion = create_diffusion("10")
    sched = diffusion.schedule
    y = jnp.array([1, 2])
    z = jax.random.normal(jax.random.PRNGKey(12), (2, 4, 8, 8))
    rng = jax.random.PRNGKey(13)
    full_fn, cached_fn = fns(model, params, y)
    mask = onp.array([1, 0, 0, 1, 0, 1, 1, 0, 0, 0], bool)

    got = _cached_loop_masked("p", full_fn, cached_fn, z.shape, sched,
                              refresh_mask=mask, noise=z, rng=rng,
                              clip_denoised=False)
    T = sched.num_timesteps
    x, cache = jnp.asarray(z), None
    for k_step in range(T):
        i = T - 1 - k_step
        t = jnp.full((2,), i, jnp.int32)
        t_model = sched.timestep_map[t]
        if mask[k_step]:
            out, cache = full_fn(x, t_model)
        else:
            out = cached_fn(x, t_model, cache)
        n = jax.random.normal(jax.random.fold_in(rng, i), z.shape, jnp.float32)
        x = gaussian.p_sample_step(sched, out, x, t, n,
                                   clip_denoised=False).sample
    np.testing.assert_allclose(np.asarray(got), np.asarray(x),
                               rtol=2e-5, atol=2e-5)


def test_masked_loop_cfg_with_logsnr_schedule(small_model):
    model, params = small_model
    diffusion = create_diffusion("12")
    y = jnp.array([1, 2, 10, 10])
    z = jax.random.normal(jax.random.PRNGKey(14), (4, 4, 8, 8))
    apply = lambda x, t, **kw: model.apply(
        params, x, t, y, method=model.forward_with_cfg, cfg_scale=1.5, **kw)
    out = diffusion.p_sample_loop_cached(
        lambda x, t: apply(x, t, want_cache=True),
        lambda x, t, cache: apply(x, t, cache=cache),
        z.shape, interval=3, refresh_schedule="logsnr", noise=z,
        rng=jax.random.PRNGKey(15), clip_denoised=False)
    assert out.shape == z.shape
    assert bool(jnp.isfinite(out).all())
