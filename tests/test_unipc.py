"""UniPC sampler (sampling.unipc_sample_loop).

Beyond-reference capability (the reference ships only DDPM/DDIM,
`/root/reference/diffusion/gaussian_diffusion.py:376,513`), pinned by
mathematical anchors rather than golden values:

1. corrector=False, variant="bh2", order=2 IS DPM-Solver++(2M): the UniP-2
   simplified rho=1/2 predictor is algebraically the 2M multistep update,
   so the two loops must agree to float tolerance on any model.
2. order=1, corrector=False reduces to the eta=0 DDIM update.
3. The corrector raises the effective order at the same model-call budget:
   at a small step count it must land closer to a fine-grained
   deterministic solution than DPM++(2M) with the same budget.
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


def test_predictor_only_bh2_equals_dpm_solver_2m():
    diff = create_diffusion("25")
    z = _xT()
    dpm = diff.dpm_solver_sample_loop(eps_model, SHAPE, noise=z, order=2,
                                      clip_denoised=False)
    uni = diff.unipc_sample_loop(eps_model, SHAPE, noise=z, order=2,
                                 corrector=False, variant="bh2",
                                 clip_denoised=False)
    np.testing.assert_allclose(np.asarray(uni), np.asarray(dpm),
                               rtol=2e-4, atol=2e-5)


def test_order1_predictor_only_equals_ddim():
    diff = create_diffusion("50")
    z = _xT(1)
    ddim = diff.ddim_sample_loop(eps_model, SHAPE, noise=z, eta=0.0,
                                 clip_denoised=False)
    uni = diff.unipc_sample_loop(eps_model, SHAPE, noise=z, order=1,
                                 corrector=False, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(uni), np.asarray(ddim),
                               rtol=2e-4, atol=2e-5)


def test_corrector_beats_dpm_at_low_steps():
    """Same model-call budget, higher effective order: UniPC with the
    corrector must track the probability-flow ODE better than DPM++(2M)."""
    z = _xT(2)
    ref = create_diffusion("500").ddim_sample_loop(
        eps_model, SHAPE, noise=z, eta=0.0, clip_denoised=False)
    few = create_diffusion("8")
    e_dpm = rel_l2(few.dpm_solver_sample_loop(
        eps_model, SHAPE, noise=z, order=2, clip_denoised=False), ref)
    e_uni = rel_l2(few.unipc_sample_loop(
        eps_model, SHAPE, noise=z, order=2, corrector=True,
        clip_denoised=False), ref)
    assert e_uni < e_dpm, (e_uni, e_dpm)


@pytest.mark.parametrize("variant", ["bh1", "bh2"])
def test_converges_with_steps(variant):
    z = _xT(3)
    ref = create_diffusion("500").ddim_sample_loop(
        eps_model, SHAPE, noise=z, eta=0.0, clip_denoised=False)
    errs = [rel_l2(create_diffusion(str(n)).unipc_sample_loop(
        eps_model, SHAPE, noise=z, order=2, variant=variant,
        clip_denoised=False), ref)
        for n in (5, 10, 25)]
    assert errs[0] > errs[1] > errs[2], errs
    assert errs[2] < 2e-3, errs


def test_single_step_returns_x0_prediction():
    """T=1: the only update targets sigma=0, i.e. the pure x0 prediction
    (no history -> order-1 predictor, corrector never fires)."""
    diff = create_diffusion("1")
    z = _xT(4)
    out = diff.unipc_sample_loop(eps_model, SHAPE, noise=z,
                                 clip_denoised=False)
    from fast_dit_tpu.diffusion import gaussian
    t = jnp.full((SHAPE[0],), 0, jnp.int32)
    mv = gaussian.p_mean_variance(
        diff.schedule, eps_model(z, diff.schedule.timestep_map[t]), z, t,
        clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(mv.pred_xstart),
                               rtol=1e-5, atol=1e-6)


def test_two_steps_finite_and_deterministic():
    """T=2 exercises the no-second-order-history edge (rho_p stays 0,
    order-1 corrector at k=1)."""
    diff = create_diffusion("2")
    z = _xT(5)
    x1 = diff.unipc_sample_loop(eps_model, SHAPE, noise=z, clip_denoised=False)
    x2 = diff.unipc_sample_loop(eps_model, SHAPE, noise=z, clip_denoised=False)
    assert bool(jnp.isfinite(x1).all())
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))


def test_intermediates_and_jit_rng_entry():
    diff = create_diffusion("20")
    z = _xT(6)
    x1, inter = diff.unipc_sample_loop(
        eps_model, SHAPE, noise=z, return_intermediates=True,
        clip_denoised=False)
    assert inter.shape == (20, *SHAPE)
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(x1))
    out = jax.jit(lambda r: diff.unipc_sample_loop(
        eps_model, SHAPE, rng=r, clip_denoised=False))(jax.random.PRNGKey(0))
    assert out.shape == SHAPE and bool(jnp.isfinite(out).all())


def test_rejects_bad_args():
    diff = create_diffusion("10")
    with pytest.raises(AssertionError):
        diff.unipc_sample_loop(eps_model, SHAPE, noise=_xT(), order=3)
    with pytest.raises(AssertionError):
        diff.unipc_sample_loop(eps_model, SHAPE, noise=_xT(), variant="bh3")
