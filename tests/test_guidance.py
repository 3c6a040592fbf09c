"""Classifier-guidance hooks and LEARNED-variance coverage
(reference gaussian_diffusion.py:346-374 condition_mean/score)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.diffusion import (
    DiffusionSchedule,
    VarType,
    gaussian,
    get_named_beta_schedule,
    sampling,
)

T = 50
SHAPE = (2, 4, 8, 8)


def sched(**kw):
    return DiffusionSchedule.create(get_named_beta_schedule("linear", T), **kw)


def model_fn(x, t):
    eps = 0.1 * x
    return jnp.concatenate([eps, jnp.zeros_like(x)], axis=1)


def test_condition_mean_shifts_by_variance_times_grad():
    s = sched()
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([5, 20])
    out = gaussian.p_mean_variance(s, model_fn(x, t), x, t, clip_denoised=False)
    grad = jnp.ones(SHAPE) * 0.3
    shifted = gaussian.condition_mean(s, grad, out)
    np.testing.assert_allclose(
        np.asarray(shifted.mean), np.asarray(out.mean + out.variance * 0.3),
        rtol=1e-6)


def test_condition_score_moves_pred_xstart():
    s = sched()
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([5, 20])
    out = gaussian.p_mean_variance(s, model_fn(x, t), x, t, clip_denoised=False)
    grad = jnp.ones(SHAPE) * 0.5
    new = gaussian.condition_score(s, grad, out, x, t)
    # eps' = eps - sqrt(1-abar)*grad -> pred_xstart increases
    assert float(jnp.mean(new.pred_xstart - out.pred_xstart)) > 0
    # mean recomputed from the new pred_xstart
    m, _, _ = gaussian.q_posterior_mean_variance(s, new.pred_xstart, x, t)
    np.testing.assert_allclose(np.asarray(new.mean), np.asarray(m), rtol=1e-6)


def test_cond_fn_in_sampling_loops():
    s = sched()
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    noise = jax.random.normal(jax.random.PRNGKey(2), (T, *SHAPE))
    cond_fn = lambda x, t: 0.05 * jnp.ones_like(x)
    base = sampling.p_sample_loop(model_fn, SHAPE, s, noise=x_init,
                                  step_noise=noise)
    guided = sampling.p_sample_loop(model_fn, SHAPE, s, noise=x_init,
                                    step_noise=noise, cond_fn=cond_fn)
    # constant positive gradient pushes samples up
    assert float(jnp.mean(guided - base)) > 0
    # ddim uses condition_score
    gd = sampling.ddim_sample_loop(model_fn, SHAPE, s, noise=x_init,
                                   cond_fn=cond_fn)
    bd = sampling.ddim_sample_loop(model_fn, SHAPE, s, noise=x_init)
    assert float(jnp.mean(gd - bd)) > 0


def test_learned_variance_type():
    """VarType.LEARNED: model's second half IS the log-variance
    (reference gaussian_diffusion.py:285-287 LEARNED branch)."""
    s = sched(var_type=VarType.LEARNED)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    t = jnp.array([3, 30])
    logvar = jnp.full(SHAPE, -2.5)
    out = jnp.concatenate([0.1 * x, logvar], axis=1)
    res = gaussian.p_mean_variance(s, out, x, t, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(res.log_variance), -2.5, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(res.variance), np.exp(-2.5), rtol=1e-5)


def test_facade_cond_fn_kwargs():
    from fast_dit_tpu.diffusion import create_diffusion

    diff = create_diffusion("10", diffusion_steps=100)
    out = diff.p_sample_loop(
        lambda x, t, y=None: model_fn(x, t), SHAPE,
        rng=jax.random.PRNGKey(0),
        cond_fn=lambda x, t: 0.1 * jnp.ones_like(x),
        model_kwargs={"y": jnp.array([1, 2])})
    assert out.shape == SHAPE
