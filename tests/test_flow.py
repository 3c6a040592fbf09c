"""Flow matching (diffusion/flow.py): analytic-oracle integrator tests,
loss-contract tests, and trainer integration.

The oracle: for data ~ N(m, s²·I) under the interpolant
x_t = alpha·x0 + sigma·eps, the marginal is N(alpha·m, c(t)²·I) with
c(t) = sqrt(alpha²·s² + sigma²), and the OPTIMAL velocity field is affine:

    v*(x, t) = alpha'·m + [(alpha'·alpha·s² + sigma'·sigma) / c²]·(x - alpha·m)

whose probability-flow ODE has the closed-form solution
x(t) = alpha(t)·m + c(t)·z from x(1) = z — so the exact endpoint is
x(0) = m + s·z. Everything here checks against that, in fp64-free fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_dit_tpu.diffusion import (FLOW_PATHS, flow_path_coeffs,
                                    flow_reverse_loop, flow_sample_loop,
                                    flow_training_losses)

T_SCALE = 1000.0


def analytic_velocity(m, s, path):
    """The optimal velocity field for data ~ N(m, s^2 I) (see module doc)."""

    def v(x, t_model):
        t = t_model.astype(jnp.float32) / T_SCALE
        alpha, sigma, d_alpha, d_sigma = flow_path_coeffs(t, path)
        c2 = alpha**2 * s**2 + sigma**2
        a = (d_alpha * alpha * s**2 + d_sigma * sigma) / c2
        shape = (-1,) + (1,) * (x.ndim - 1)
        return (d_alpha.reshape(shape) * m
                + a.reshape(shape) * (x - alpha.reshape(shape) * m))

    return v


# ---------------------------------------------------------------------------
# path coefficients
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", FLOW_PATHS)
def test_path_endpoints_and_derivatives(path):
    t = jnp.linspace(0.0, 1.0, 101)
    alpha, sigma, d_alpha, d_sigma = flow_path_coeffs(t, path)
    # endpoints: t=0 is data, t=1 is noise
    np.testing.assert_allclose(alpha[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(sigma[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(alpha[-1], 0.0, atol=1e-6)
    np.testing.assert_allclose(sigma[-1], 1.0, atol=1e-6)
    # derivatives match finite differences of the coefficients
    num_da = jnp.gradient(alpha, t)
    num_ds = jnp.gradient(sigma, t)
    np.testing.assert_allclose(d_alpha[1:-1], num_da[1:-1], atol=5e-4)
    np.testing.assert_allclose(d_sigma[1:-1], num_ds[1:-1], atol=5e-4)


def test_unknown_path_raises():
    with pytest.raises(NotImplementedError):
        flow_path_coeffs(jnp.array([0.5]), "cosine")


# ---------------------------------------------------------------------------
# ODE integration vs the closed-form Gaussian solution
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("path", FLOW_PATHS)
def test_sampler_hits_gaussian_endpoint(path):
    """Fine-grid Euler on the analytic field lands on x(0) = m + s·z."""
    m, s = 0.7, 0.5
    z = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 8, 8))
    out = flow_sample_loop(analytic_velocity(m, s, path), z.shape,
                           num_steps=512, method="euler", noise=z,
                           t_scale=T_SCALE)
    np.testing.assert_allclose(np.asarray(out), np.asarray(m + s * z),
                               atol=5e-3)


def test_heun_beats_euler_at_equal_steps():
    m, s = -0.3, 0.8
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 3, 8, 8))
    exact = np.asarray(m + s * z)
    v = analytic_velocity(m, s, "linear")
    err = {}
    for method in ("euler", "heun"):
        out = flow_sample_loop(v, z.shape, num_steps=16, method=method,
                               noise=z, t_scale=T_SCALE)
        err[method] = float(np.abs(np.asarray(out) - exact).max())
    assert err["heun"] < 0.3 * err["euler"], err
    assert err["heun"] < 5e-3, err


def test_reverse_loop_inverts_sampling():
    """Encode(decode(z)) ≈ z — deterministic inversion, the ddim-reverse
    analog."""
    m, s = 0.2, 0.6
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 8, 8))
    v = analytic_velocity(m, s, "linear")
    x0 = flow_sample_loop(v, z.shape, num_steps=256, method="heun", noise=z,
                          t_scale=T_SCALE)
    z_back = flow_reverse_loop(v, x0, num_steps=256, method="heun",
                               t_scale=T_SCALE)
    np.testing.assert_allclose(np.asarray(z_back), np.asarray(z), atol=5e-3)


def test_rng_noise_equivalence_and_unknown_method():
    v = analytic_velocity(0.0, 1.0, "linear")
    rng = jax.random.PRNGKey(3)
    noise = jax.random.normal(rng, (2, 3, 4, 4))
    a = flow_sample_loop(v, noise.shape, num_steps=8, noise=noise)
    b = flow_sample_loop(v, noise.shape, num_steps=8, rng=rng)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    with pytest.raises(NotImplementedError):
        flow_sample_loop(v, noise.shape, num_steps=4, method="rk4",
                         noise=noise)


# ---------------------------------------------------------------------------
# training loss contract
# ---------------------------------------------------------------------------

def test_loss_zero_at_optimum_for_delta_data():
    """For a point-mass dataset, x_t determines eps exactly, so the optimal
    velocity attains ZERO loss — and the analytic field (s→0 limit) is it."""
    x0 = jnp.full((8, 3, 8, 8), 0.37)
    t = jnp.linspace(0.05, 0.95, 8)  # stay off sigma=0
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    v = analytic_velocity(0.37, 1e-4, "linear")
    terms = flow_training_losses(v, x0, t, noise, path="linear",
                                 t_scale=T_SCALE)
    assert terms["loss"].shape == (8,)
    assert float(terms["loss"].max()) < 1e-6
    # a wrong model scores a strictly positive loss
    bad = flow_training_losses(lambda x, tm: jnp.zeros_like(x), x0, t, noise)
    assert float(bad["loss"].min()) > 0.1


def test_loss_gradient_flows():
    def model_fn_of(w):
        return lambda x, tm: w * x

    x0 = jax.random.normal(jax.random.PRNGKey(5), (4, 3, 4, 4))
    t = jnp.array([0.2, 0.4, 0.6, 0.8])
    noise = jax.random.normal(jax.random.PRNGKey(6), x0.shape)

    def loss(w):
        return flow_training_losses(model_fn_of(w), x0, t, noise)["loss"].mean()

    g = jax.grad(loss)(1.0)
    assert np.isfinite(g) and abs(float(g)) > 1e-3


def test_learn_sigma_model_rejected():
    x0 = jnp.zeros((2, 4, 8, 8))
    t = jnp.array([0.3, 0.7])
    noise = jnp.zeros_like(x0)
    doubled = lambda x, tm: jnp.concatenate([x, x], axis=1)
    with pytest.raises(AssertionError, match="learn_sigma"):
        flow_training_losses(doubled, x0, t, noise)


# ---------------------------------------------------------------------------
# trainer integration (--objective flow)
# ---------------------------------------------------------------------------

def test_train_step_flow_objective():
    """make_train_step(objective='flow') on a tiny learn_sigma=False DiT:
    finite decreasing-ish loss, params actually move, EMA tracks."""
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.train import create_train_state, make_train_step

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, learn_sigma=False,
                attn_backend="einsum")
    schedule = create_diffusion("").schedule  # unused by the flow loss
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr=1e-3)
    step = jax.jit(make_train_step(model, schedule, tx, objective="flow",
                                   ema_decay=0.9),
                   donate_argnums=(0,))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)}
    p0 = jax.tree.leaves(state.params)[0].copy()
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(7 + i))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    assert int(state.step) == 4
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]),
                           np.asarray(p0))


def test_train_step_flow_rejects_loss_aware_sampler():
    from fast_dit_tpu.diffusion import (create_diffusion,
                                        create_named_schedule_sampler)
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.train import create_train_state, make_train_step

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=32,
                depth=1, num_heads=4, num_classes=10, learn_sigma=False,
                attn_backend="einsum")
    schedule = create_diffusion("").schedule
    sampler_state = create_named_schedule_sampler("loss-second-moment",
                                                  schedule.num_timesteps)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr=1e-3,
                                   sampler_state=sampler_state)
    step = make_train_step(model, schedule, tx, objective="flow")
    batch = {"x": jnp.zeros((4, 4, 8, 8)),
             "y": jnp.zeros((4,), jnp.int32)}
    with pytest.raises(AssertionError, match="flow matching"):
        step(state, batch, jax.random.PRNGKey(1))


def test_flow_cfg_full_channel_guidance():
    """forward_with_cfg(guidance_channels=in_channels) + flow_sample_loop:
    at cfg_scale=1 the guided chain equals the conditional chain exactly."""
    from fast_dit_tpu.models import DiT

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=32,
                depth=1, num_heads=4, num_classes=10, learn_sigma=False,
                attn_backend="einsum")
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((2, 4, 8, 8)), jnp.zeros((2,)),
                        jnp.zeros((2,), jnp.int32))
    # perturb the zero-init head so outputs are non-trivial
    params = jax.tree.map(
        lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(1), p.shape,
                                               p.dtype), params)
    y = jnp.array([3, 7])
    y_cfg = jnp.concatenate([y, jnp.full((2,), 10)])
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 4, 8, 8))
    z_cfg = jnp.concatenate([z, z], axis=0)

    cfg_apply = lambda x, t: model.apply(
        params, x, t, y_cfg, method=model.forward_with_cfg, cfg_scale=1.0,
        guidance_channels=model.in_channels)
    cond_apply = lambda x, t: model.apply(params, x, t, y)

    guided = flow_sample_loop(cfg_apply, z_cfg.shape, num_steps=6,
                              method="heun", noise=z_cfg)[:2]
    cond = flow_sample_loop(cond_apply, z.shape, num_steps=6, method="heun",
                            noise=z)
    np.testing.assert_allclose(np.asarray(guided), np.asarray(cond),
                               atol=1e-5)
