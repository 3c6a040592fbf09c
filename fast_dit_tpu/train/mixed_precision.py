"""Master-weight mixed precision: bf16 model params, fp32 optimizer master.

The reference's AMP path keeps fp32 master weights inside torch/accelerate's
GradScaler machinery (`train_options/train_amp.py`); on TPU the equivalent —
and the key to fitting DiT-XL/2 Adam training in 16 GB HBM — is storing the
*model* params in bf16 (halves the live weights AND the gradients AND removes
XLA's hoisted fp32->bf16 convert copies) while the optimizer holds an fp32
master copy and does its update in full precision. No loss scaling is needed:
bf16 has fp32's exponent range.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["MasterWeightsState", "masterize", "get_master_params"]


class MasterWeightsState(NamedTuple):
    master: optax.Params   # fp32 master copy
    inner: optax.OptState


def masterize(tx: optax.GradientTransformation) -> optax.GradientTransformation:
    """Wrap `tx` so it updates an fp32 master copy and emits low-precision
    parameter deltas. Use with bf16 model params."""

    def init(params):
        master = jax.tree.map(lambda p: p.astype(jnp.float32), params)
        return MasterWeightsState(master=master, inner=tx.init(master))

    def update(grads, state, params=None):
        g32 = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        updates, inner = tx.update(g32, state.inner, state.master)
        master = optax.apply_updates(state.master, updates)
        assert params is not None, "masterize.update needs current params"
        lowp_updates = jax.tree.map(
            lambda m, p: m.astype(p.dtype) - p, master, params)
        return lowp_updates, MasterWeightsState(master=master, inner=inner)

    return optax.GradientTransformation(init, update)


def get_master_params(opt_state):
    """fp32 master tree if the optimizer keeps one (masterized optax chain
    or the fused Pallas update state), else None."""
    if hasattr(opt_state, "master"):
        return opt_state.master
    return None
