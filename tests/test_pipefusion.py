"""PipeFusion patch-pipelined inference: correctness pins on the CPU mesh.

Three-layer proof structure (parallel/pipefusion.py):
1. num_chunks=1 is EXACT vs model.apply — the schedule, stage sharding, and
   per-chunk block math introduce no approximation.
2. cache consistency: a chunked forward immediately after an identical exact
   forward reproduces the exact output to float tolerance — i.e. the ONLY
   approximation anywhere is K/V being one diffusion step old.
3. warm stale caches beat cold ones, and the full sampler degenerates to
   ddim_sample_loop when every step is a warmup step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import create_diffusion
from fast_dit_tpu.models import DiT
from fast_dit_tpu.parallel import (create_pipeline_mesh, init_kv_cache,
                                   pipefusion_forward, pipefusion_sample_loop)


def tiny_dit(depth=8, **kw):
    # attn_backend="xla" so the reference forward uses the exact same
    # jax.nn.dot_product_attention the chunked path calls
    return DiT(input_size=8, patch_size=2, in_channels=4, hidden_size=32,
               depth=depth, num_heads=4, num_classes=10,
               attn_backend="xla", **kw)


def init_params(model, B=4, seed=2):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 8, 8))
    t = jnp.arange(B) % 10
    y = jnp.arange(B) % 10
    params = model.init({"params": jax.random.PRNGKey(1)}, x, t, y)
    params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(seed), p.shape) * 0.05,
        params)
    return params, x, t, y


@pytest.mark.parametrize("n_stages", [2, 4, 8])
def test_single_chunk_is_exact(n_stages):
    """num_chunks=1 == model.apply for every stage count dividing depth."""
    model = tiny_dit(depth=8)
    params, x, t, y = init_params(model)
    want = model.apply(params, x, t, y)

    mesh = create_pipeline_mesh(n_stages)
    kv = init_kv_cache(model, x.shape[0])
    got, new_kv = pipefusion_forward(model, params, x, t, y, kv,
                                     mesh=mesh, num_chunks=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # the cache must now hold the full fresh K/V (no zeros left)
    assert float(jnp.abs(new_kv).min(axis=(1, 2, 4, 5)).min()) >= 0.0
    assert float(jnp.abs(new_kv).mean()) > 1e-4


@pytest.mark.parametrize("num_chunks", [2, 4])
def test_chunked_after_exact_is_exact(num_chunks):
    """With a cache warmed on IDENTICAL inputs, stale K/V == fresh K/V, so
    the chunked forward must reproduce the exact output — this pins the
    chunk schedule, offsets, and cache update logic bit-tight."""
    model = tiny_dit(depth=8)
    params, x, t, y = init_params(model)
    want = model.apply(params, x, t, y)

    mesh = create_pipeline_mesh(4)
    kv = init_kv_cache(model, x.shape[0])
    _, kv = pipefusion_forward(model, params, x, t, y, kv,
                               mesh=mesh, num_chunks=1)
    got, _ = pipefusion_forward(model, params, x, t, y, kv,
                                mesh=mesh, num_chunks=num_chunks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_warm_cache_beats_cold():
    """On a *changed* input (one diffusion step later), the chunked forward
    with a warm cache must be far closer to exact than with a cold cache."""
    model = tiny_dit(depth=8)
    params, x, t, y = init_params(model)
    mesh = create_pipeline_mesh(4)

    # simulate one reverse step: slightly denoised x at t-1
    x2 = 0.98 * x + 0.02 * jax.random.normal(jax.random.PRNGKey(5), x.shape)
    t2 = jnp.maximum(t - 1, 0)
    want = model.apply(params, x2, t2, y)

    kv0 = init_kv_cache(model, x.shape[0])
    _, kv_warm = pipefusion_forward(model, params, x, t, y, kv0,
                                    mesh=mesh, num_chunks=1)
    got_warm, _ = pipefusion_forward(model, params, x2, t2, y, kv_warm,
                                     mesh=mesh, num_chunks=4)
    got_cold, _ = pipefusion_forward(model, params, x2, t2, y, kv0,
                                     mesh=mesh, num_chunks=4)

    err = lambda a: float(jnp.linalg.norm(a - want) / jnp.linalg.norm(want))
    assert err(got_warm) < 0.05, f"warm-cache drift too large: {err(got_warm)}"
    assert err(got_warm) < 0.5 * err(got_cold), (
        f"warm {err(got_warm)} not clearly better than cold {err(got_cold)}")


def test_sample_loop_all_warmup_matches_ddim():
    """warmup >= T (every step exact) must equal the standard DDIM sampler."""
    model = tiny_dit(depth=8)
    params, x, _, y = init_params(model)
    diffusion = create_diffusion("ddim5")
    B = x.shape[0]
    noise = jax.random.normal(jax.random.PRNGKey(7), (B, 4, 8, 8))

    model_fn = lambda xs, ts: model.apply(params, xs, ts, y)
    want = diffusion.ddim_sample_loop(model_fn, noise.shape, noise=noise,
                                      clip_denoised=True)

    mesh = create_pipeline_mesh(4)
    got = pipefusion_sample_loop(model, params, noise.shape,
                                 diffusion.schedule, y, mesh=mesh,
                                 num_chunks=4, warmup=5, kind="ddim",
                                 noise=noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sample_loop_chunked_close_to_exact():
    """The honest check: chunked sampling (warmup=2 of 8 ddim steps) lands
    near the exact sampler — staleness is bounded by one step — and is NOT
    bit-identical (it really took the approximate path)."""
    model = tiny_dit(depth=8)
    params, x, _, y = init_params(model)
    diffusion = create_diffusion("ddim8")
    B = x.shape[0]
    noise = jax.random.normal(jax.random.PRNGKey(9), (B, 4, 8, 8))

    model_fn = lambda xs, ts: model.apply(params, xs, ts, y)
    want = diffusion.ddim_sample_loop(model_fn, noise.shape, noise=noise,
                                      clip_denoised=True)

    mesh = create_pipeline_mesh(4)
    got = pipefusion_sample_loop(model, params, noise.shape,
                                 diffusion.schedule, y, mesh=mesh,
                                 num_chunks=4, warmup=2, kind="ddim",
                                 noise=noise)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert rel < 0.05, f"chunked sampling drifted {rel:.4f} from exact"
    assert rel > 0.0, "chunked path suspiciously bit-identical to exact"


def test_cfg_all_warmup_matches_doubled_batch_cfg():
    """cfg_scale with warmup >= T must equal the standard CFG recipe: DDIM
    on the doubled batch through forward_with_cfg, first half kept
    (sample.py's path; reference sample.py:54-64)."""
    model = tiny_dit(depth=8)
    params, x, _, y = init_params(model)
    diffusion = create_diffusion("ddim5")
    B = x.shape[0]
    z = jax.random.normal(jax.random.PRNGKey(13), (B, 4, 8, 8))

    yy = jnp.concatenate([y, jnp.full((B,), model.num_classes)])
    cfg_fn = lambda xs, ts: model.apply(params, xs, ts, yy,
                                        method=model.forward_with_cfg,
                                        cfg_scale=2.5)
    want = diffusion.ddim_sample_loop(
        cfg_fn, (2 * B, 4, 8, 8), noise=jnp.concatenate([z, z]),
        clip_denoised=True)[:B]

    mesh = create_pipeline_mesh(4)
    got = pipefusion_sample_loop(model, params, z.shape, diffusion.schedule,
                                 y, mesh=mesh, num_chunks=4, warmup=5,
                                 kind="ddim", noise=z, cfg_scale=2.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_cfg_chunked_close_to_exact():
    """Chunked CFG sampling stays near the exact CFG chain and actually
    diverges from it (the approximate path really ran)."""
    model = tiny_dit(depth=8)
    params, x, _, y = init_params(model)
    diffusion = create_diffusion("ddim8")
    B = x.shape[0]
    z = jax.random.normal(jax.random.PRNGKey(17), (B, 4, 8, 8))

    yy = jnp.concatenate([y, jnp.full((B,), model.num_classes)])
    cfg_fn = lambda xs, ts: model.apply(params, xs, ts, yy,
                                        method=model.forward_with_cfg,
                                        cfg_scale=2.5)
    want = diffusion.ddim_sample_loop(
        cfg_fn, (2 * B, 4, 8, 8), noise=jnp.concatenate([z, z]),
        clip_denoised=True)[:B]

    mesh = create_pipeline_mesh(4)
    got = pipefusion_sample_loop(model, params, z.shape, diffusion.schedule,
                                 y, mesh=mesh, num_chunks=4, warmup=2,
                                 kind="ddim", noise=z, cfg_scale=2.5)
    rel = float(jnp.linalg.norm(got - want) / jnp.linalg.norm(want))
    assert 0.0 < rel < 0.05, f"chunked CFG drifted {rel:.4f} from exact"


def test_p_sampler_kind_runs():
    """DDPM kind threads the same per-step noise contract as sampling._loop."""
    model = tiny_dit(depth=8)
    params, x, _, y = init_params(model)
    diffusion = create_diffusion("5")  # 5-step DDPM respacing
    mesh = create_pipeline_mesh(2)
    out = pipefusion_sample_loop(model, params, (4, 4, 8, 8),
                                 diffusion.schedule, y, mesh=mesh,
                                 num_chunks=2, warmup=1, kind="p",
                                 rng=jax.random.PRNGKey(3))
    assert out.shape == (4, 4, 8, 8)
    assert bool(jnp.isfinite(out).all())
