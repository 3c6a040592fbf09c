"""Sampler tests: the lax.scan loops must agree step-for-step with an explicit
Python-loop reference built from the same step primitives, and the DDIM ODE
must invert itself (SURVEY.md §4 seam (c): injectable-noise parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.diffusion import (
    DiffusionSchedule,
    create_diffusion,
    gaussian,
    get_named_beta_schedule,
    sampling,
    space_timesteps,
)

T_ORIG = 40
SHAPE = (2, 4, 8, 8)


def make_sched(respace=None):
    betas = get_named_beta_schedule("linear", T_ORIG)
    use = space_timesteps(T_ORIG, respace) if respace else None
    return DiffusionSchedule.create(betas, use_timesteps=use)


def t_dependent_model(x, t_model):
    """Model whose output depends on x AND the (original-process) timestep, so
    any timestep-mapping bug changes the result."""
    tval = t_model.astype(jnp.float32).reshape(-1, 1, 1, 1)
    eps = 0.1 * x * jnp.sin(tval * 0.37) + 0.01 * tval / 100.0
    var = jnp.tanh(0.05 * x + tval * 0.01)
    return jnp.concatenate([eps, var], axis=1)


def python_p_sample_loop(sched, model_fn, x_init, step_noise, clip_denoised=True):
    """Straight Python loop over the same step primitive, applying the
    timestep map explicitly — mirrors the reference's loop structure
    (gaussian_diffusion.py:498-511)."""
    x = x_init
    tmap = np.asarray(sched.timestep_map)
    for k, i in enumerate(range(sched.num_timesteps - 1, -1, -1)):
        t = jnp.full((x.shape[0],), i, jnp.int32)
        t_model = jnp.asarray(tmap[np.asarray(t)])
        out = model_fn(x, t_model)
        res = gaussian.p_sample_step(sched, out, x, t, step_noise[k],
                                     clip_denoised=clip_denoised)
        x = res.sample
    return x


def python_ddim_loop(sched, model_fn, x_init, eta=0.0, step_noise=None):
    x = x_init
    tmap = np.asarray(sched.timestep_map)
    for k, i in enumerate(range(sched.num_timesteps - 1, -1, -1)):
        t = jnp.full((x.shape[0],), i, jnp.int32)
        t_model = jnp.asarray(tmap[np.asarray(t)])
        out = model_fn(x, t_model)
        n = step_noise[k] if step_noise is not None else None
        res = gaussian.ddim_step(sched, out, x, t, n, eta=eta)
        x = res.sample
    return x


def test_p_sample_loop_matches_python_loop():
    for respace in [None, "10"]:
        sched = make_sched(respace)
        rng = jax.random.PRNGKey(0)
        x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
        step_noise = jax.random.normal(
            jax.random.PRNGKey(2), (sched.num_timesteps, *SHAPE))
        got = sampling.p_sample_loop(
            t_dependent_model, SHAPE, sched, noise=x_init, step_noise=step_noise)
        expected = python_p_sample_loop(sched, t_dependent_model, x_init, step_noise)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-5, atol=1e-5)


def test_ddim_loop_matches_python_loop():
    sched = make_sched("10")
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    got = sampling.ddim_sample_loop(t_dependent_model, SHAPE, sched, noise=x_init)
    expected = python_ddim_loop(sched, t_dependent_model, x_init)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_ddim_eta_nonzero_matches_python_loop():
    sched = make_sched("10")
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    step_noise = jax.random.normal(jax.random.PRNGKey(2), (sched.num_timesteps, *SHAPE))
    got = sampling.ddim_sample_loop(
        t_dependent_model, SHAPE, sched, noise=x_init, step_noise=step_noise, eta=0.5)
    expected = python_ddim_loop(sched, t_dependent_model, x_init, eta=0.5,
                                step_noise=step_noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


def test_ddim_deterministic_reproducible():
    sched = make_sched("10")
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    a = sampling.ddim_sample_loop(t_dependent_model, SHAPE, sched, noise=x_init)
    b = sampling.ddim_sample_loop(t_dependent_model, SHAPE, sched, noise=x_init)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rng_only_sampling_deterministic():
    sched = make_sched("10")
    rng = jax.random.PRNGKey(7)
    a = sampling.p_sample_loop(t_dependent_model, SHAPE, sched, rng=rng)
    b = sampling.p_sample_loop(t_dependent_model, SHAPE, sched, rng=rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = sampling.p_sample_loop(t_dependent_model, SHAPE, sched, rng=jax.random.PRNGKey(8))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_ddim_reverse_step_inverts_forward_step():
    """For a constant-eps model, reverse_step at t followed by ddim_step at
    t+1 is an EXACT inverse (the pred_xstart is preserved along the ODE)."""
    betas = get_named_beta_schedule("linear", T_ORIG)
    sched = DiffusionSchedule.create(betas)
    const_eps = 0.3 * jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    model_out = jnp.concatenate([const_eps, jnp.zeros(SHAPE)], axis=1)

    x_t = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
    for ti in [0, 7, T_ORIG - 2]:
        t = jnp.full((SHAPE[0],), ti, jnp.int32)
        up = gaussian.ddim_reverse_step(sched, model_out, x_t, t, clip_denoised=False)
        t1 = t + 1
        down = gaussian.ddim_step(sched, model_out, up.sample, t1, clip_denoised=False)
        np.testing.assert_allclose(np.asarray(down.sample), np.asarray(x_t),
                                   rtol=2e-4, atol=2e-4)


def test_ddim_reverse_loop_runs():
    betas = get_named_beta_schedule("linear", T_ORIG)
    sched = DiffusionSchedule.create(betas)
    x0 = 0.5 * jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    x_t = sampling.ddim_reverse_sample_loop(
        t_dependent_model, x0, sched, clip_denoised=False)
    assert x_t.shape == SHAPE
    assert np.isfinite(np.asarray(x_t)).all()


def test_return_intermediates():
    sched = make_sched("10")
    x_init = jax.random.normal(jax.random.PRNGKey(1), SHAPE)
    final, inter = sampling.ddim_sample_loop(
        t_dependent_model, SHAPE, sched, noise=x_init, return_intermediates=True)
    assert inter.shape == (10, *SHAPE)
    np.testing.assert_array_equal(np.asarray(inter[-1]), np.asarray(final))


def test_facade_create_diffusion():
    diff = create_diffusion("10", diffusion_steps=T_ORIG)
    assert diff.num_timesteps == 10
    assert diff.original_num_steps == T_ORIG
    out = diff.p_sample_loop(
        lambda x, t: t_dependent_model(x, t), SHAPE, rng=jax.random.PRNGKey(0))
    assert out.shape == SHAPE

    # default factory = full 1000-step LEARNED_RANGE EPSILON MSE
    d = create_diffusion("")
    assert d.num_timesteps == 1000
    assert d.schedule.var_type.value == "learned_range"
    assert d.schedule.mean_type.value == "epsilon"
    assert d.schedule.loss_type.value == "mse"


def test_facade_training_losses_with_kwargs():
    diff = create_diffusion("", diffusion_steps=T_ORIG)
    x0 = jax.random.normal(jax.random.PRNGKey(0), SHAPE)

    def model_fn(x, t, y=None):
        assert y is not None
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=1)

    terms = diff.training_losses(
        model_fn, x0, jnp.array([0, 5]), model_kwargs={"y": jnp.array([1, 2])},
        rng=jax.random.PRNGKey(1))
    assert terms["loss"].shape == (2,)


def test_jit_compiles_whole_sampler():
    """The entire 10-step chain must trace into ONE jitted program."""
    sched = make_sched("10")

    @jax.jit
    def run(rng):
        return sampling.p_sample_loop(t_dependent_model, SHAPE, sched, rng=rng)

    out = run(jax.random.PRNGKey(0))
    assert out.shape == SHAPE
