"""Tests for importance-sampling timestep samplers
(reference timestep_sampler.py:27-150)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.diffusion import (
    LossSecondMomentState,
    UniformSamplerState,
    create_named_schedule_sampler,
    sample_timesteps,
    update_with_losses,
)

T = 20


def test_factory():
    assert isinstance(create_named_schedule_sampler("uniform", T), UniformSamplerState)
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", T), LossSecondMomentState)
    try:
        create_named_schedule_sampler("nope", T)
        assert False
    except NotImplementedError:
        pass


def test_uniform_sampler():
    state = create_named_schedule_sampler("uniform", T)
    ts, w = sample_timesteps(state, jax.random.PRNGKey(0), 512)
    assert ts.shape == (512,) and w.shape == (512,)
    assert (np.asarray(ts) >= 0).all() and (np.asarray(ts) < T).all()
    np.testing.assert_allclose(np.asarray(w), 1.0, rtol=1e-6)  # uniform => weight 1
    # update is a no-op
    assert update_with_losses(state, ts, w) is state


def np_reference_update(history, counts, ts, losses, hpt):
    """Independent numpy port of the documented ring-buffer semantics
    (reference timestep_sampler.py:139-147)."""
    history, counts = history.copy(), counts.copy()
    for t, loss in zip(ts, losses):
        if counts[t] == hpt:
            history[t, :-1] = history[t, 1:]
            history[t, -1] = loss
        else:
            history[t, counts[t]] = loss
            counts[t] += 1
    return history, counts


def test_loss_second_moment_update_matches_numpy():
    state = LossSecondMomentState.create(T, history_per_term=4)
    rng = np.random.RandomState(0)
    hist = np.zeros((T, 4), np.float32)
    counts = np.zeros((T,), np.int64)
    for _ in range(5):
        ts = rng.randint(0, T, size=16)
        losses = rng.rand(16).astype(np.float32)
        state = update_with_losses(state, jnp.asarray(ts), jnp.asarray(losses))
        hist, counts = np_reference_update(hist, counts, ts, losses, 4)
    np.testing.assert_allclose(np.asarray(state.loss_history), hist, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.loss_counts), counts)


def test_warmup_weights_uniform_then_loss_aware():
    state = LossSecondMomentState.create(T, history_per_term=2)
    w = state.weights()
    np.testing.assert_allclose(np.asarray(w), 1.0)  # not warmed up

    # warm up: 2 losses for every t
    for _ in range(2):
        state = update_with_losses(
            state, jnp.arange(T), jnp.linspace(0.1, 2.0, T))
    w = np.asarray(state.weights())
    assert not np.allclose(w, w[0])  # no longer uniform
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)
    # higher loss => higher weight
    assert w[-1] > w[0]


def test_repeated_timestep_shifts_multiple_times():
    state = LossSecondMomentState.create(4, history_per_term=2)
    ts = jnp.array([1, 1, 1, 1])
    losses = jnp.array([1.0, 2.0, 3.0, 4.0])
    state = update_with_losses(state, ts, losses)
    # ring buffer keeps the 2 most recent values for t=1
    np.testing.assert_allclose(np.asarray(state.loss_history[1]), [3.0, 4.0])


def test_update_is_jittable():
    state = LossSecondMomentState.create(T, history_per_term=4)
    jitted = jax.jit(update_with_losses)
    out = jitted(state, jnp.array([0, 1]), jnp.array([0.5, 0.25]))
    assert float(out.loss_history[0, 0]) == 0.5


def test_importance_weights_unbiased():
    """E[w * f(t)] over the sampler should approximate E_uniform[f(t)]."""
    state = LossSecondMomentState.create(T, history_per_term=1)
    state = update_with_losses(
        state, jnp.arange(T), jnp.linspace(0.5, 3.0, T))
    ts, w = sample_timesteps(state, jax.random.PRNGKey(0), 200_000)
    f = np.asarray(ts, np.float64)  # f(t) = t
    est = float(np.mean(np.asarray(w, np.float64) * f))
    np.testing.assert_allclose(est, (T - 1) / 2, rtol=0.05)
