"""Importance sampling over diffusion timesteps, as functional pytree state.

Capability parity with `/root/reference/diffusion/timestep_sampler.py`:
`UniformSampler` (:62-68), `LossAwareSampler.update_with_local_losses`
(:72-103, whose `dist.all_gather` synchronization is replaced by GSPMD — a
replicated sampler state updated from a sharded global batch inside `jit`
yields the all-gather automatically), and `LossSecondMomentResampler`
(:120-150, the per-timestep loss ring buffer).

Everything is pure: `sample(state, rng, batch)` draws timesteps + importance
weights, `update(state, ts, losses)` returns a new state. Both are jittable,
so the resampler lives inside the training step with no host sync.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "UniformSamplerState",
    "LossSecondMomentState",
    "create_named_schedule_sampler",
    "sample_timesteps",
    "update_with_losses",
]


@struct.dataclass
class UniformSamplerState:
    """Uniform t ~ U[0, T) (reference timestep_sampler.py:62-68)."""

    num_timesteps: int = struct.field(pytree_node=False)

    def weights(self) -> jnp.ndarray:
        return jnp.ones((self.num_timesteps,), jnp.float32)


@struct.dataclass
class LossSecondMomentState:
    """Ring buffer of recent losses per timestep (reference timestep_sampler.py:120-150)."""

    loss_history: jnp.ndarray  # (T, history_per_term) float32
    loss_counts: jnp.ndarray   # (T,) int32
    num_timesteps: int = struct.field(pytree_node=False)
    history_per_term: int = struct.field(pytree_node=False)
    uniform_prob: float = struct.field(pytree_node=False)

    @classmethod
    def create(cls, num_timesteps: int, history_per_term: int = 10,
               uniform_prob: float = 0.001) -> "LossSecondMomentState":
        return cls(
            loss_history=jnp.zeros((num_timesteps, history_per_term), jnp.float32),
            loss_counts=jnp.zeros((num_timesteps,), jnp.int32),
            num_timesteps=num_timesteps,
            history_per_term=history_per_term,
            uniform_prob=uniform_prob,
        )

    def _warmed_up(self) -> jnp.ndarray:
        return jnp.all(self.loss_counts == self.history_per_term)

    def weights(self) -> jnp.ndarray:
        """sqrt(E[loss^2]) per timestep once warmed up, else uniform
        (reference timestep_sampler.py:130-137)."""
        w = jnp.sqrt(jnp.mean(self.loss_history ** 2, axis=-1))
        w = w / jnp.sum(w)
        w = w * (1 - self.uniform_prob) + self.uniform_prob / self.num_timesteps
        uniform = jnp.ones((self.num_timesteps,), jnp.float32)
        return jnp.where(self._warmed_up(), w, uniform)


def create_named_schedule_sampler(name: str, num_timesteps: int):
    """Sampler-state factory (reference timestep_sampler.py:13-24)."""
    if name == "uniform":
        return UniformSamplerState(num_timesteps=num_timesteps)
    elif name == "loss-second-moment":
        return LossSecondMomentState.create(num_timesteps)
    raise NotImplementedError(f"unknown schedule sampler: {name}")


def sample_timesteps(state, rng: jax.Array, batch_size: int):
    """Importance-sample (timesteps, weights) for a batch
    (reference timestep_sampler.py:44-59).

    weights[i] = 1 / (T * p[t_i]) keeps the objective unbiased.
    """
    w = state.weights()
    p = w / jnp.sum(w)
    ts = jax.random.choice(rng, state.num_timesteps, shape=(batch_size,), p=p)
    weights = 1.0 / (state.num_timesteps * p[ts])
    return ts, weights


def update_with_losses(state, ts: jnp.ndarray, losses: jnp.ndarray):
    """Fold a batch of (t, loss) pairs into the sampler state
    (reference timestep_sampler.py:139-147 `update_with_all_losses`).

    Processes the batch sequentially (scan) so repeated timesteps shift the
    ring buffer multiple times, exactly like the reference's Python loop.
    Uniform samplers are stateless and returned unchanged.
    """
    if isinstance(state, UniformSamplerState):
        return state

    def body(carry, inp):
        history, counts = carry
        t, loss = inp
        count = counts[t]
        row = history[t]
        shifted = jnp.concatenate([row[1:], jnp.array([loss], row.dtype)])
        appended = row.at[jnp.minimum(count, state.history_per_term - 1)].set(loss)
        new_row = jnp.where(count == state.history_per_term, shifted, appended)
        history = history.at[t].set(new_row)
        counts = counts.at[t].set(jnp.minimum(count + 1, state.history_per_term))
        return (history, counts), None

    (history, counts), _ = jax.lax.scan(
        body,
        (state.loss_history, state.loss_counts),
        (ts.astype(jnp.int32), losses.astype(jnp.float32)),
    )
    return state.replace(loss_history=history, loss_counts=counts)
