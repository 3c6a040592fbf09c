"""Golden-value tests for schedule tables (SURVEY.md §4 seam (a))."""

import numpy as np
import pytest

from fast_dit_tpu.diffusion import (
    DiffusionSchedule,
    get_beta_schedule,
    get_named_beta_schedule,
    space_timesteps,
)


def test_linear_1000_endpoints():
    betas = get_named_beta_schedule("linear", 1000)
    # Ho et al. linear schedule: scale=1 at 1000 steps
    assert betas.dtype == np.float64
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=0, atol=0)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=0, atol=0)
    # independent recomputation
    expected = np.linspace(1e-4, 0.02, 1000, dtype=np.float64)
    np.testing.assert_array_equal(betas, expected)


def test_linear_scales_with_steps():
    betas = get_named_beta_schedule("linear", 500)
    expected = np.linspace(2 * 1e-4, 2 * 0.02, 500, dtype=np.float64)
    np.testing.assert_array_equal(betas, expected)


def test_squaredcos_cap():
    import math
    betas = get_named_beta_schedule("squaredcos_cap_v2", 100)
    assert (betas <= 0.999).all() and (betas > 0).all()
    # spot-check i=0 against the closed form
    f = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
    np.testing.assert_allclose(betas[0], min(1 - f(1 / 100) / f(0), 0.999), rtol=1e-12)
    np.testing.assert_allclose(betas[57], min(1 - f(58 / 100) / f(57 / 100), 0.999), rtol=1e-12)


def test_legacy_schedules():
    for name in ["quad", "linear", "warmup10", "warmup50", "const", "jsd"]:
        betas = get_beta_schedule(name, beta_start=1e-4, beta_end=0.02,
                                  num_diffusion_timesteps=100)
        assert betas.shape == (100,)
        assert (betas > 0).all() and (betas <= 1).all()
    # jsd: 1/T ... 1
    betas = get_beta_schedule("jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=10)
    np.testing.assert_allclose(betas[0], 1 / 10, rtol=1e-15)
    np.testing.assert_allclose(betas[-1], 1.0, rtol=1e-15)


def test_derived_tables_identities():
    betas = get_named_beta_schedule("linear", 1000)
    tabs = DiffusionSchedule.create_fp64_tables(betas)
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    np.testing.assert_allclose(tabs["alphas_cumprod"], abar, rtol=1e-14)
    np.testing.assert_allclose(tabs["alphas_cumprod_prev"][1:], abar[:-1], rtol=1e-14)
    assert tabs["alphas_cumprod_prev"][0] == 1.0
    assert tabs["alphas_cumprod_next"][-1] == 0.0
    np.testing.assert_allclose(
        tabs["posterior_variance"],
        betas * (1 - tabs["alphas_cumprod_prev"]) / (1 - abar),
        rtol=1e-14,
    )
    # log-variance clipping: slot 0 patched with slot 1's value
    assert tabs["posterior_log_variance_clipped"][0] == np.log(tabs["posterior_variance"][1])
    # posterior mean coefs sum: coef1 + coef2*? identity: for x0 = x_t = v,
    # posterior mean should equal v at stationarity only when coef1+coef2 == 1
    np.testing.assert_allclose(
        tabs["posterior_mean_coef1"] + tabs["posterior_mean_coef2"] * np.sqrt(alphas) * 0 + 0,
        tabs["posterior_mean_coef1"], rtol=0)  # structural smoke
    # closed-form check of the coefficients
    np.testing.assert_allclose(
        tabs["posterior_mean_coef1"],
        betas * np.sqrt(tabs["alphas_cumprod_prev"]) / (1 - abar), rtol=1e-14)
    # FIXED_LARGE table
    np.testing.assert_allclose(
        tabs["fixed_large_variance"],
        np.append(tabs["posterior_variance"][1], betas[1:]), rtol=0)


def test_respaced_alphas_cumprod_match_original():
    """The key respacing invariant (reference respace.py:79-86): rebuilt betas
    must reproduce the original alphas_cumprod at the kept timesteps."""
    betas = get_named_beta_schedule("linear", 1000)
    keep = sorted(space_timesteps(1000, "250"))
    tabs = DiffusionSchedule.create_fp64_tables(betas, use_timesteps=keep)
    abar_orig = np.cumprod(1 - betas)
    np.testing.assert_allclose(tabs["alphas_cumprod"], abar_orig[keep], rtol=1e-12)
    assert len(tabs["betas"]) == 250


def test_schedule_pytree_fp32_close_to_fp64():
    betas = get_named_beta_schedule("linear", 1000)
    sched = DiffusionSchedule.create(betas)
    tabs = DiffusionSchedule.create_fp64_tables(betas)
    for name in ["betas", "alphas_cumprod", "sqrt_alphas_cumprod",
                 "posterior_mean_coef1", "posterior_mean_coef2",
                 "posterior_log_variance_clipped"]:
        np.testing.assert_allclose(
            np.asarray(getattr(sched, name)), tabs[name].astype(np.float32), rtol=2e-7)
    assert sched.num_timesteps == 1000
    assert not sched.is_respaced
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), np.arange(1000))


def test_respaced_timestep_map():
    betas = get_named_beta_schedule("linear", 1000)
    keep = space_timesteps(1000, "250")
    sched = DiffusionSchedule.create(betas, use_timesteps=keep)
    assert sched.num_timesteps == 250
    assert sched.original_num_steps == 1000
    assert sched.is_respaced
    np.testing.assert_array_equal(np.asarray(sched.timestep_map), sorted(keep))


def test_bad_betas_rejected():
    with pytest.raises(AssertionError):
        DiffusionSchedule.create(np.array([0.0, 0.5]))
    with pytest.raises(AssertionError):
        DiffusionSchedule.create(np.array([[0.1, 0.5]]))
