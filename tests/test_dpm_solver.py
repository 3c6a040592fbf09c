"""DPM-Solver++(2M) sampler (sampling.dpm_solver_sample_loop).

Beyond-reference capability (the reference ships only DDPM/DDIM,
`/root/reference/diffusion/gaussian_diffusion.py:376,513`), pinned by two
mathematical anchors rather than golden values:

1. order=1 reduces ALGEBRAICALLY to the eta=0 DDIM update (the DPM-Solver++
   first-order step in x0 parameterization IS the DDIM step), so the two
   loops must agree to float tolerance on any model.
2. order=2 is a higher-order ODE solver: at a small step budget it must land
   closer to a fine-grained deterministic solution than first-order DDIM
   with the same budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import create_diffusion


def eps_model(x, t):
    """Nonlinear, bounded analytic eps-prediction (t-dependent), with a
    zero variance head matching the default learn_sigma output contract."""
    scale = 0.3 + 0.1 * jnp.cos(t.astype(jnp.float32))[:, None, None, None] / 10.0
    eps = scale * jnp.tanh(x)
    return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)


SHAPE = (2, 4, 8, 8)


def _xT(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), SHAPE)


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / np.linalg.norm(b))


def test_order1_equals_ddim():
    diff = create_diffusion("50")
    z = _xT()
    ddim = diff.ddim_sample_loop(eps_model, SHAPE, noise=z, eta=0.0,
                                 clip_denoised=False)
    dpm1 = diff.dpm_solver_sample_loop(eps_model, SHAPE, noise=z, order=1,
                                       clip_denoised=False)
    np.testing.assert_allclose(np.asarray(dpm1), np.asarray(ddim),
                               rtol=2e-4, atol=2e-5)


def test_order2_beats_ddim_at_low_steps():
    """Second-order multistep tracks the probability-flow ODE better than
    DDIM at the same (small) model-call budget."""
    z = _xT(1)
    ref = create_diffusion("500").ddim_sample_loop(
        eps_model, SHAPE, noise=z, eta=0.0, clip_denoised=False)
    few = create_diffusion("10")
    ddim10 = few.ddim_sample_loop(eps_model, SHAPE, noise=z, eta=0.0,
                                  clip_denoised=False)
    dpm10 = few.dpm_solver_sample_loop(eps_model, SHAPE, noise=z, order=2,
                                       clip_denoised=False)
    e_ddim = rel_l2(ddim10, ref)
    e_dpm = rel_l2(dpm10, ref)
    assert e_dpm < e_ddim, (e_dpm, e_ddim)
    # and it should be a decisive improvement, not a rounding artifact
    assert e_dpm < 0.7 * e_ddim, (e_dpm, e_ddim)


def test_order2_converges_with_steps():
    z = _xT(2)
    ref = create_diffusion("500").ddim_sample_loop(
        eps_model, SHAPE, noise=z, eta=0.0, clip_denoised=False)
    errs = [rel_l2(create_diffusion(str(n)).dpm_solver_sample_loop(
        eps_model, SHAPE, noise=z, order=2, clip_denoised=False), ref)
        for n in (5, 10, 25)]
    assert errs[0] > errs[1] > errs[2], errs


def test_single_step_returns_x0_prediction():
    """T=1: the only update targets sigma=0, i.e. the pure x0 prediction."""
    diff = create_diffusion("1")
    z = _xT(3)
    out = diff.dpm_solver_sample_loop(eps_model, SHAPE, noise=z,
                                      clip_denoised=False)
    from fast_dit_tpu.diffusion import gaussian
    t = jnp.full((SHAPE[0],), 0, jnp.int32)
    mv = gaussian.p_mean_variance(
        diff.schedule, eps_model(z, diff.schedule.timestep_map[t]), z, t,
        clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mv.pred_xstart),
                               rtol=1e-5, atol=1e-6)


def test_intermediates_and_determinism():
    diff = create_diffusion("20")
    z = _xT(4)
    x1, inter = diff.dpm_solver_sample_loop(
        eps_model, SHAPE, noise=z, return_intermediates=True,
        clip_denoised=False)
    assert inter.shape == (20, *SHAPE)
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(x1))
    x2 = diff.dpm_solver_sample_loop(eps_model, SHAPE, noise=z,
                                     clip_denoised=False)
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_jit_and_rng_entry():
    diff = create_diffusion("10")
    out = jax.jit(lambda r: diff.dpm_solver_sample_loop(
        eps_model, SHAPE, rng=r, clip_denoised=False))(jax.random.PRNGKey(0))
    assert out.shape == SHAPE and bool(jnp.isfinite(out).all())


def test_rejects_bad_order():
    diff = create_diffusion("10")
    with pytest.raises(AssertionError):
        diff.dpm_solver_sample_loop(eps_model, SHAPE, noise=_xT(), order=3)
