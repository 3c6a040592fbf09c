"""Guidance interval (arXiv:2404.07724): CFG restricted to a noise-level
band. Exactness anchors: a band covering every sigma reproduces the plain
CFG chain (up to lax.cond-vs-inline op reordering); out-of-band steps run
the conditional model only."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import (create_diffusion, guidance_interval_fn,
                                    guidance_interval_mask)
from fast_dit_tpu.models import DiT


def tiny_model_and_params(B=2):
    model = DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
                depth=2, num_heads=4, num_classes=10, attn_backend="einsum")
    x = jnp.zeros((B, 4, 8, 8))
    t = jnp.zeros((B,), jnp.int32)
    y = jnp.zeros((B,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t, y)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef, [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
                  for p, k in zip(leaves, keys)])
    return model, params


def test_mask_band_and_extremes():
    d = create_diffusion("50")
    # sigma is monotone in t, so the band is a contiguous t-range
    m = guidance_interval_mask(d.schedule, 0.3, 3.0)
    tm = np.asarray(d.schedule.timestep_map)
    on = np.flatnonzero(m[tm])
    assert on.size > 0 and np.array_equal(on, np.arange(on[0], on[-1] + 1))
    # an all-covering band guides every step; an empty band guides none
    assert guidance_interval_mask(d.schedule, 0.0, np.inf)[tm].all()
    assert not guidance_interval_mask(d.schedule, 1e9, 2e9)[tm].any()


def test_full_band_reproduces_plain_cfg_chain():
    # single model call: identical math modulo lax.cond branch compilation,
    # so a tight relative tolerance holds even though the 10-step cfg=4
    # chain amplifies reordering noise beyond bit-exactness
    model, params = tiny_model_and_params()
    d = create_diffusion("10")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg = lambda x, t: model.apply(params, x, t, y,
                                   method=model.forward_with_cfg, cfg_scale=4.0)
    cond = lambda x, t: model.apply(params, x, t, y[:n])
    wrapped = guidance_interval_fn(cfg, cond, d.schedule, 0.0, np.inf)

    z = jax.random.normal(jax.random.PRNGKey(2), (2 * n, 4, 8, 8))
    want = d.ddim_sample_loop(cfg, z.shape, noise=z, clip_denoised=False)
    got = d.ddim_sample_loop(wrapped, z.shape, noise=z, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)
    # and per-call (no chain amplification) the wrapper is tight
    tm = np.asarray(d.schedule.timestep_map)
    t = jnp.full((2 * n,), int(tm[4]), jnp.int32)
    np.testing.assert_allclose(np.asarray(wrapped(z, t)),
                               np.asarray(cfg(z, t)), rtol=1e-6, atol=1e-6)


def test_out_of_band_is_conditional_only():
    model, params = tiny_model_and_params()
    d = create_diffusion("10")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg = lambda x, t: model.apply(params, x, t, y,
                                   method=model.forward_with_cfg, cfg_scale=4.0)
    cond = lambda x, t: model.apply(params, x, t, y[:n])
    # empty band: every step must equal the mirrored conditional forward
    wrapped = guidance_interval_fn(cfg, cond, d.schedule, 1e9, 2e9)

    x = jax.random.normal(jax.random.PRNGKey(3), (2 * n, 4, 8, 8))
    tm = np.asarray(d.schedule.timestep_map)
    t = jnp.full((2 * n,), int(tm[5]), jnp.int32)
    got = wrapped(x, t)
    want_half = cond(x[:n], t[:n])
    np.testing.assert_allclose(np.asarray(got[:n]), np.asarray(want_half),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got[:n]), np.asarray(got[n:]))


def test_in_band_matches_cfg_out_of_band_differs():
    model, params = tiny_model_and_params()
    d = create_diffusion("50")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg = lambda x, t: model.apply(params, x, t, y,
                                   method=model.forward_with_cfg, cfg_scale=4.0)
    cond = lambda x, t: model.apply(params, x, t, y[:n])
    wrapped = guidance_interval_fn(cfg, cond, d.schedule, 0.3, 3.0)

    mask = guidance_interval_mask(d.schedule, 0.3, 3.0)
    tm = np.asarray(d.schedule.timestep_map)
    k_in = int(np.flatnonzero(mask[tm])[0])
    k_out = int(np.flatnonzero(~mask[tm])[0])
    x = jax.random.normal(jax.random.PRNGKey(4), (2 * n, 4, 8, 8))
    for k, guided in ((k_in, True), (k_out, False)):
        t = jnp.full((2 * n,), int(tm[k]), jnp.int32)
        got = wrapped(x, t)
        want = cfg(x, t)
        if guided:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-6, atol=1e-6)
        else:
            assert float(jnp.abs(got - want).max()) > 1e-6


@pytest.mark.parametrize("sampler", ["ddim", "dpm"])
def test_interval_chain_runs_and_differs(sampler):
    """A real band produces a finite chain that differs from full CFG (the
    compute saving is not a silent no-op) under both plain and dpm loops."""
    model, params = tiny_model_and_params()
    d = create_diffusion("10")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg = lambda x, t: model.apply(params, x, t, y,
                                   method=model.forward_with_cfg, cfg_scale=4.0)
    cond = lambda x, t: model.apply(params, x, t, y[:n])
    wrapped = guidance_interval_fn(cfg, cond, d.schedule, 0.3, 3.0)
    loop = d.ddim_sample_loop if sampler == "ddim" else d.dpm_solver_sample_loop

    z = jax.random.normal(jax.random.PRNGKey(5), (2 * n, 4, 8, 8))
    got = loop(wrapped, z.shape, noise=z, clip_denoised=False)
    want = loop(cfg, z.shape, noise=z, clip_denoised=False)
    assert bool(jnp.isfinite(got).all())
    assert float(jnp.abs(got - want).max()) > 1e-6


# ---------------------------------------------------------------------------
# composed guidance interval x FORA layer cache
# ---------------------------------------------------------------------------

from fast_dit_tpu.diffusion import (guidance_interval_cached_fns,
                                    guided_steps_korder)
from fast_dit_tpu.diffusion.sampling import cache_refresh_mask
from fast_dit_tpu.diffusion import gaussian


def cfg_cond_fns(model, params, y, n):
    cfg = lambda x, t, **kw: model.apply(params, x, t, y,
                                         method=model.forward_with_cfg,
                                         cfg_scale=4.0, **kw)
    cond = lambda x, t, **kw: model.apply(params, x, t, y[:n], **kw)
    return cfg, cond


def test_forced_refresh_marks_band_entry():
    d = create_diffusion("50")
    model, params = tiny_model_and_params()
    cfg, cond = cfg_cond_fns(model, params, jnp.array([3, 7, 10, 10]), 2)
    _, _, forced = guidance_interval_cached_fns(cfg, cond, d.schedule, 0.3, 3.0)
    g = guided_steps_korder(d.schedule, 0.3, 3.0)
    # the guided segment is contiguous and forced marks exactly its entry
    on = np.flatnonzero(g)
    assert on.size > 0 and np.array_equal(on, np.arange(on[0], on[-1] + 1))
    assert np.array_equal(np.flatnonzero(forced), [on[0]])


def test_composed_interval1_equals_plain_guidance_loop():
    """interval=1 refreshes every step: the composed loop must reproduce the
    plain guidance-interval chain (same fold_in noise keys)."""
    model, params = tiny_model_and_params()
    d = create_diffusion("10")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg, cond = cfg_cond_fns(model, params, y, n)
    full_fn, cached_fn, forced = guidance_interval_cached_fns(
        cfg, cond, d.schedule, 0.3, 3.0)
    wrapped = guidance_interval_fn(cfg, cond, d.schedule, 0.3, 3.0)

    z = jax.random.normal(jax.random.PRNGKey(6), (2 * n, 4, 8, 8))
    rng = jax.random.PRNGKey(7)
    want = d.p_sample_loop(wrapped, z.shape, noise=z, rng=rng,
                           clip_denoised=False)
    got = d.p_sample_loop_cached(full_fn, cached_fn, z.shape, interval=1,
                                 force_refresh_mask=forced, noise=z, rng=rng,
                                 clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_composed_full_band_equals_plain_cached_cfg():
    """An all-covering band reduces the composition to the ordinary cached
    CFG loop (the forced band-entry refresh lands on step 0, already a
    refresh)."""
    model, params = tiny_model_and_params()
    d = create_diffusion("12")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg, cond = cfg_cond_fns(model, params, y, n)
    full_fn, cached_fn, forced = guidance_interval_cached_fns(
        cfg, cond, d.schedule, 0.0, np.inf)
    assert np.array_equal(np.flatnonzero(forced), [0])

    z = jax.random.normal(jax.random.PRNGKey(8), (2 * n, 4, 8, 8))
    want = d.ddim_sample_loop_cached(
        lambda x, t: cfg(x, t, want_cache=True),
        lambda x, t, cache: cfg(x, t, cache=cache),
        z.shape, interval=3, noise=z, clip_denoised=False)
    got = d.ddim_sample_loop_cached(full_fn, cached_fn, z.shape, interval=3,
                                    force_refresh_mask=forced, noise=z,
                                    clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_composed_empty_band_equals_halfbatch_cond_cached():
    """An empty band: every step is conditional-only; the first half of the
    composed chain must equal the half-batch cached conditional chain (ddim
    eta=0: deterministic, halves evolve independently)."""
    model, params = tiny_model_and_params()
    d = create_diffusion("12")
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg, cond = cfg_cond_fns(model, params, y, n)
    full_fn, cached_fn, forced = guidance_interval_cached_fns(
        cfg, cond, d.schedule, 1e9, 2e9)
    assert not forced.any()

    z = jax.random.normal(jax.random.PRNGKey(9), (n, 4, 8, 8))
    zz = jnp.concatenate([z, z], 0)
    got = d.ddim_sample_loop_cached(full_fn, cached_fn, zz.shape, interval=3,
                                    force_refresh_mask=forced, noise=zz,
                                    clip_denoised=False)
    want = d.ddim_sample_loop_cached(
        lambda x, t: cond(x, t, want_cache=True),
        lambda x, t, cache: cond(x, t, cache=cache),
        z.shape, interval=3, noise=z, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got[:n]), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got[:n]), np.asarray(got[n:]))


def test_composed_matches_python_reference_loop():
    """Pin the scan/cond machinery against a straightforward Python loop
    with the SAME wrapped model fns and refresh mask (mid-chain band, so all
    four step kinds occur: guided/unguided x refresh/cached)."""
    model, params = tiny_model_and_params()
    d = create_diffusion("12")
    sched = d.schedule
    n = 2
    y = jnp.array([3, 7] + [10] * n)
    cfg, cond = cfg_cond_fns(model, params, y, n)
    full_fn, cached_fn, forced = guidance_interval_cached_fns(
        cfg, cond, sched, 0.3, 3.0)
    interval = 3
    mask = cache_refresh_mask(sched, interval) | forced
    g = guided_steps_korder(sched, 0.3, 3.0)
    assert 0 < g.sum() < len(g), "band must be strictly mid-chain"
    assert (~mask[np.flatnonzero(g)[0]] or True)  # entry may coincide

    z = jax.random.normal(jax.random.PRNGKey(10), (2 * n, 4, 8, 8))
    T = sched.num_timesteps
    x = z
    cache = None
    for k in range(T):
        i = T - 1 - k
        t = jnp.full((2 * n,), i, jnp.int32)
        t_model = sched.timestep_map[t]
        if mask[k]:
            out, cache = full_fn(x, t_model)
        else:
            out = cached_fn(x, t_model, cache)
        x = gaussian.ddim_step(sched, out, x, t, None, eta=0.0,
                               clip_denoised=False).sample
    want = x
    got = d.ddim_sample_loop_cached(full_fn, cached_fn, z.shape,
                                    interval=interval,
                                    force_refresh_mask=forced, noise=z,
                                    clip_denoised=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    assert bool(jnp.isfinite(got).all())
