"""Numerical tests for the Gaussian-diffusion math core."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import (
    DiffusionSchedule,
    LossType,
    MeanType,
    VarType,
    gaussian,
    get_named_beta_schedule,
    space_timesteps,
)

T = 50


def make_sched(**kw):
    betas = get_named_beta_schedule("linear", T)
    return DiffusionSchedule.create(betas, **kw)


def rand(key, *shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


# ---------------------------------------------------------------------------
# utils
# ---------------------------------------------------------------------------

def test_normal_kl_identity_zero():
    m = rand(0, 4, 3)
    lv = rand(1, 4, 3)
    kl = gaussian.normal_kl(m, lv, m, lv)
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_normal_kl_closed_form():
    # KL(N(m1,v1) || N(0,1)) = 0.5*(v1 + m1^2 - 1 - log v1)
    m1, lv1 = 0.7, np.log(0.5)
    kl = gaussian.normal_kl(jnp.array(m1), jnp.array(lv1), 0.0, 0.0)
    expected = 0.5 * (0.5 + 0.49 - 1 - lv1)
    np.testing.assert_allclose(float(kl), expected, rtol=1e-6)


def test_discretized_gaussian_ll_independent_impl():
    """Compare against an independent numpy implementation of the same
    discretized-CDF construction (reference diffusion_utils.py:62-88)."""
    rng = np.random.RandomState(0)
    x = np.clip(rng.randn(100).astype(np.float32), -1, 1)
    # keep |centered_x| * inv_stdv moderate: deep-tail fp32 tanh saturation
    # differs between XLA and numpy (both clip to log(1e-12) eventually)
    means = x + rng.randn(100).astype(np.float32) * 0.1
    log_scales = (rng.rand(100).astype(np.float32) * 1.5 - 1.5).astype(np.float32)

    def np_cdf(v):
        v = v.astype(np.float32)  # match the fp32 compute path
        return (0.5 * (1 + np.tanh(np.sqrt(2 / np.pi) * (v + 0.044715 * v ** 3)))).astype(np.float32)

    inv = np.exp(-log_scales)
    cdf_p = np_cdf(inv * (x - means + 1 / 255))
    cdf_m = np_cdf(inv * (x - means - 1 / 255))
    expected = np.where(
        x < -0.999,
        np.log(np.maximum(cdf_p, 1e-12)),
        np.where(
            x > 0.999,
            np.log(np.maximum(1 - cdf_m, 1e-12)),
            np.log(np.maximum(cdf_p - cdf_m, 1e-12)),
        ),
    )
    got = gaussian.discretized_gaussian_log_likelihood(
        jnp.asarray(x), means=jnp.asarray(means), log_scales=jnp.asarray(log_scales)
    )
    # fp32 rounding order differs between XLA and numpy; agreement to ~1e-3
    np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3, atol=2e-3)
    # a likelihood: log-probs of in-range bins should be <= 0
    assert (np.asarray(got) < 1e-4).all()


def test_mean_flat():
    x = jnp.arange(24, dtype=jnp.float32).reshape(2, 3, 4)
    np.testing.assert_allclose(
        np.asarray(gaussian.mean_flat(x)), np.asarray(x).reshape(2, -1).mean(-1))


# ---------------------------------------------------------------------------
# q process
# ---------------------------------------------------------------------------

def test_q_sample_formula():
    sched = make_sched()
    x0 = rand(0, 2, 4, 8, 8)
    noise = rand(1, 2, 4, 8, 8)
    t = jnp.array([0, T - 1])
    xt = gaussian.q_sample(sched, x0, t, noise)
    tabs = DiffusionSchedule.create_fp64_tables(np.asarray(sched.betas, np.float64))
    for b in range(2):
        i = int(t[b])
        expected = (
            np.float32(np.sqrt(tabs["alphas_cumprod"][i])) * np.asarray(x0[b])
            + np.float32(np.sqrt(1 - tabs["alphas_cumprod"][i])) * np.asarray(noise[b])
        )
        np.testing.assert_allclose(np.asarray(xt[b]), expected, rtol=2e-5, atol=1e-6)


def test_q_posterior_mean():
    sched = make_sched()
    x0 = rand(0, 3, 2, 4, 4)
    xt = rand(1, 3, 2, 4, 4)
    t = jnp.array([1, 10, T - 1])
    mean, var, logvar = gaussian.q_posterior_mean_variance(sched, x0, xt, t)
    c1 = np.asarray(sched.posterior_mean_coef1)
    c2 = np.asarray(sched.posterior_mean_coef2)
    for b in range(3):
        i = int(t[b])
        np.testing.assert_allclose(
            np.asarray(mean[b]), c1[i] * np.asarray(x0[b]) + c2[i] * np.asarray(xt[b]),
            rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var[:, 0, 0, 0]),
                               np.asarray(sched.posterior_variance)[np.asarray(t)])


def test_predict_xstart_eps_roundtrip():
    sched = make_sched()
    xt = rand(0, 2, 4, 4, 4)
    eps = rand(1, 2, 4, 4, 4)
    t = jnp.array([5, 20])
    x0 = gaussian.predict_xstart_from_eps(sched, xt, t, eps)
    eps2 = gaussian.predict_eps_from_xstart(sched, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps2), np.asarray(eps), rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# p_mean_variance
# ---------------------------------------------------------------------------

def test_learned_range_interpolation_endpoints():
    sched = make_sched(var_type=VarType.LEARNED_RANGE)
    x = rand(0, 2, 4, 8, 8)
    eps = rand(1, 2, 4, 8, 8)
    t = jnp.array([3, 30])
    for v, table in [(1.0, sched.log_betas), (-1.0, sched.posterior_log_variance_clipped)]:
        out = jnp.concatenate([eps, jnp.full_like(x, v)], axis=1)
        res = gaussian.p_mean_variance(sched, out, x, t, clip_denoised=False)
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(res.log_variance[b]),
                float(table[int(t[b])]), rtol=1e-5)


def test_fixed_small_and_large():
    x = rand(0, 2, 4, 8, 8)
    eps = rand(1, 2, 4, 8, 8)
    t = jnp.array([0, 30])
    small = make_sched(var_type=VarType.FIXED_SMALL, loss_type=LossType.MSE)
    res = gaussian.p_mean_variance(small, eps, x, t, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(res.variance[:, 0, 0, 0]),
                               np.asarray(small.posterior_variance)[np.asarray(t)])
    large = make_sched(var_type=VarType.FIXED_LARGE, loss_type=LossType.MSE)
    res = gaussian.p_mean_variance(large, eps, x, t, clip_denoised=False)
    np.testing.assert_allclose(np.asarray(res.variance[:, 0, 0, 0]),
                               np.asarray(large.fixed_large_variance)[np.asarray(t)])


def test_clip_denoised():
    sched = make_sched()
    x = 10 * jnp.ones((1, 2, 4, 4))
    out = jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)
    res = gaussian.p_mean_variance(sched, out, x, jnp.array([T - 1]), clip_denoised=True)
    assert float(jnp.max(jnp.abs(res.pred_xstart))) <= 1.0
    res = gaussian.p_mean_variance(sched, out, x, jnp.array([T - 1]), clip_denoised=False)
    assert float(jnp.max(jnp.abs(res.pred_xstart))) > 1.0


def test_start_x_mean_type():
    sched = make_sched(mean_type=MeanType.START_X)
    x = rand(0, 1, 4, 4, 4)
    x0_pred = rand(1, 1, 4, 4, 4)
    out = jnp.concatenate([x0_pred, jnp.zeros_like(x)], axis=1)
    res = gaussian.p_mean_variance(sched, out, x, jnp.array([10]), clip_denoised=False)
    np.testing.assert_allclose(np.asarray(res.pred_xstart), np.asarray(x0_pred))


# ---------------------------------------------------------------------------
# training losses
# ---------------------------------------------------------------------------

def test_training_losses_perfect_eps_model():
    sched = make_sched()
    x0 = rand(0, 4, 4, 8, 8)
    noise = rand(1, 4, 4, 8, 8)
    t = jnp.array([0, 5, 25, T - 1])

    def model_fn(x_t, t_model):
        # predicts exactly the injected noise; var output v=-1 -> min variance
        return jnp.concatenate([noise, -jnp.ones_like(noise)], axis=1)

    terms = gaussian.training_losses(sched, model_fn, x0, t, noise)
    np.testing.assert_allclose(np.asarray(terms["mse"]), 0.0, atol=1e-10)
    assert "vb" in terms
    assert (np.asarray(terms["loss"]) >= 0).all()
    np.testing.assert_allclose(
        np.asarray(terms["loss"]), np.asarray(terms["vb"]), atol=1e-10)


def test_vb_gradient_does_not_touch_mean():
    """The frozen-mean trick (reference gaussian_diffusion.py:758):
    d(vb)/d(eps-channels) must be exactly zero."""
    sched = make_sched()
    x0 = rand(0, 2, 4, 4, 4)
    noise = rand(1, 2, 4, 4, 4)
    t = jnp.array([5, 20])

    def vb_loss(model_out_flat):
        model_fn = lambda x_t, tm: model_out_flat.reshape(2, 8, 4, 4)
        terms = gaussian.training_losses(sched, model_fn, x0, t, noise)
        return jnp.sum(terms["vb"])

    out = rand(2, 2 * 8 * 4 * 4)
    g = jax.grad(vb_loss)(out).reshape(2, 8, 4, 4)
    np.testing.assert_allclose(np.asarray(g[:, :4]), 0.0, atol=0)  # mean channels frozen
    assert float(jnp.max(jnp.abs(g[:, 4:]))) > 0  # var channels learn


def test_mse_gradient_does_not_touch_var():
    sched = make_sched()
    x0 = rand(0, 2, 4, 4, 4)
    noise = rand(1, 2, 4, 4, 4)
    t = jnp.array([5, 20])

    def mse_loss(model_out_flat):
        model_fn = lambda x_t, tm: model_out_flat.reshape(2, 8, 4, 4)
        terms = gaussian.training_losses(sched, model_fn, x0, t, noise)
        return jnp.sum(terms["mse"])

    out = rand(2, 2 * 8 * 4 * 4)
    g = jax.grad(mse_loss)(out).reshape(2, 8, 4, 4)
    np.testing.assert_allclose(np.asarray(g[:, 4:]), 0.0, atol=0)
    assert float(jnp.max(jnp.abs(g[:, :4]))) > 0


def test_training_losses_timestep_map():
    """With a respaced schedule the model must see ORIGINAL timesteps
    (reference respace.py:124-129)."""
    betas = get_named_beta_schedule("linear", 100)
    keep = space_timesteps(100, "10")
    sched = DiffusionSchedule.create(betas, use_timesteps=keep)
    x0 = rand(0, 2, 4, 4, 4)
    noise = rand(1, 2, 4, 4, 4)
    seen = []

    def model_fn(x_t, t_model):
        seen.append(np.asarray(t_model))
        return jnp.concatenate([noise, jnp.zeros_like(noise)], axis=1)

    gaussian.training_losses(sched, model_fn, x0, jnp.array([0, 9]), noise)
    expected_map = np.array(sorted(keep))
    np.testing.assert_array_equal(seen[0], expected_map[[0, 9]])


def test_kl_loss_type():
    sched = make_sched(loss_type=LossType.KL)
    x0 = rand(0, 2, 4, 4, 4)
    noise = rand(1, 2, 4, 4, 4)
    model_fn = lambda x_t, tm: jnp.concatenate([noise, -jnp.ones_like(noise)], axis=1)
    terms = gaussian.training_losses(sched, model_fn, x0, jnp.array([3, 7]), noise)
    assert terms["loss"].shape == (2,)
    rescaled = make_sched(loss_type=LossType.RESCALED_KL)
    terms2 = gaussian.training_losses(rescaled, model_fn, x0, jnp.array([3, 7]), noise)
    np.testing.assert_allclose(
        np.asarray(terms2["loss"]), np.asarray(terms["loss"]) * T, rtol=1e-6)


def test_rescaled_mse_vb_scaling():
    sched = make_sched(loss_type=LossType.MSE)
    resc = make_sched(loss_type=LossType.RESCALED_MSE)
    x0 = rand(0, 2, 4, 4, 4)
    noise = rand(1, 2, 4, 4, 4)
    model_out = rand(2, 2, 8, 4, 4)
    model_fn = lambda x_t, tm: model_out
    t = jnp.array([3, 7])
    vb = gaussian.training_losses(sched, model_fn, x0, t, noise)["vb"]
    vb_r = gaussian.training_losses(resc, model_fn, x0, t, noise)["vb"]
    np.testing.assert_allclose(np.asarray(vb_r), np.asarray(vb) * T / 1000.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# bpd
# ---------------------------------------------------------------------------

def test_prior_bpd_small_for_standard_normal_data():
    sched = make_sched()
    # prior bpd should be small when q(x_T|x_0) is close to N(0, I)
    x0 = rand(0, 4, 2, 8, 8)
    pb = gaussian.prior_bpd(sched, x0)
    assert pb.shape == (4,)
    assert (np.asarray(pb) >= 0).all()


def test_calc_bpd_loop_shapes_and_ordering():
    sched = make_sched()
    x0 = rand(0, 2, 2, 4, 4)
    model_fn = lambda x_t, tm: jnp.concatenate(
        [jnp.zeros_like(x_t), jnp.zeros_like(x_t)], axis=1)
    out = gaussian.calc_bpd_loop(sched, model_fn, x0, jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, T)
    assert out["total_bpd"].shape == (2,)
    np.testing.assert_allclose(
        np.asarray(out["total_bpd"]),
        np.asarray(out["vb"]).sum(1) + np.asarray(out["prior_bpd"]), rtol=1e-4)
