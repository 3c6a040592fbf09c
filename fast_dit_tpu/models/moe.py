"""Mixture-of-Experts MLP for DiT blocks (DiT-MoE-style), TPU-first.

Beyond-parity capability (the reference has no MoE; SURVEY.md §2.3 lists
expert parallelism as absent): replaces the dense per-token MLP
(`layers.Mlp`, reference models_original.py:110-112) with a top-k routed
expert layer in the style of DiT-MoE / GShard / Switch.

TPU-first formulation — everything is a static-shape einsum:
- Routing is a dense (tokens, E) softmax; top-k selection is a k-step
  argmax loop (k is a tiny static constant), NOT a sort.
- Dispatch/combine are one-hot MXU matmuls over a fixed per-expert
  capacity C (GShard's dispatch tensor): tokens beyond capacity are
  dropped (their MLP contribution is zero; the residual stream carries
  them through unchanged). No scatter/gather, no dynamic shapes — the
  same lesson ops/tome.py measured (scatter-add ~880us vs matmul ~130us
  per block on v5e).
- Expert FFNs are stacked weights with a LEADING EXPERT AXIS
  (wi: (E, D, H), wo: (E, H, D)) so expert parallelism is a
  PartitionSpec on axis 0 (parallel/mesh.py _EP_RULES) — GSPMD turns
  the dispatch/combine einsums into the all-to-all, exactly the
  scaling-book recipe (mesh + sharding annotations, XLA collectives).

Auxiliary losses (sown into the 'losses' collection only when it is
mutable, i.e. during training):
- load-balance loss (Switch Transformers eq. 4): E * sum_e f_e * p_e,
  where f_e = fraction of tokens whose top-1 choice is e and p_e = mean
  router probability for e. 1.0 at perfect balance.
- router z-loss (ST-MoE): mean(logsumexp(logits)^2), keeps logits small.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import xavier_uniform, zeros_init

__all__ = ["MoeMlp", "expert_capacity"]


def stacked_xavier_uniform(rng, shape, dtype=jnp.float32):
    """Per-expert xavier_uniform over a leading expert axis.

    flax's xavier_uniform on an (E, D, H) kernel treats the leading dims as
    receptive field (fan_in = E*D), so every expert would initialize
    ~sqrt(E) smaller than its dense equivalent. vmap the dense initializer
    over axis 0 so each (D, H) expert matches `layers.Mlp` exactly."""
    return jax.vmap(lambda r: xavier_uniform(r, shape[1:], dtype))(
        jax.random.split(rng, shape[0]))


def expert_capacity(num_tokens: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Per-expert token capacity C (static): ceil(k*S/E) * factor, >= 1."""
    c = int(-(-top_k * num_tokens * capacity_factor // num_experts))
    return max(c, 1)


def _top_k_one_hot(gates, k):
    """k-step argmax over the expert axis (no sort — VPU-cheap for tiny k).

    gates: (..., E) router probabilities. Returns (sel, topg):
    sel (..., k, E) one-hot choices (an expert is picked at most once per
    token), topg (..., k) the gate values of the choices.
    """
    sels, topgs = [], []
    masked = gates
    for _ in range(k):
        idx = jnp.argmax(masked, axis=-1)
        oh = jax.nn.one_hot(idx, gates.shape[-1], dtype=gates.dtype)
        sels.append(oh)
        topgs.append(jnp.sum(oh * gates, axis=-1))
        # exclude the chosen expert additively: a multiplicative *0 mask can
        # re-select an already-chosen expert when all remaining gates
        # underflow to exactly 0 (argmax ties resolve to index 0), silently
        # burning a capacity slot
        masked = jnp.where(oh > 0, -jnp.inf, masked)
    return jnp.stack(sels, axis=-2), jnp.stack(topgs, axis=-1)


class MoeMlp(nn.Module):
    """Top-k routed expert MLP, drop-in for `layers.Mlp` inside DiTBlock.

    With num_experts=1, top_k=1 and ample capacity this is EXACTLY the
    dense Mlp (gate softmax over one expert is 1.0; tested in
    tests/test_moe.py), so the MoE block family is a strict superset of
    the canonical DiT block.
    """

    num_experts: int
    hidden_features: int
    out_features: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, S, D = x.shape
        E, k = self.num_experts, min(self.top_k, self.num_experts)
        C = expert_capacity(S, E, k, self.capacity_factor)

        # --- router: fp32 logits/softmax regardless of activation dtype ----
        logits = nn.Dense(E, use_bias=False, kernel_init=xavier_uniform,
                          dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))
        gates = jax.nn.softmax(logits, axis=-1)          # (B, S, E)
        sel, topg = _top_k_one_hot(gates, k)             # (B,S,k,E), (B,S,k)
        # renormalize the kept gates so the combine weights sum to 1
        topg = topg / jnp.maximum(
            jnp.sum(topg, axis=-1, keepdims=True), 1e-9)

        # --- capacity positions: cumsum over (choice-major, token) order ---
        # first-choice tokens claim capacity before second-choice ones.
        # Everything downstream of the fp32 router is cast to the activation
        # dtype here: the dispatch/combine einsums and expert FFN must run
        # (and return) in x.dtype, or a bf16 block's residual stream would
        # silently promote to fp32 (a scan-carry dtype mismatch under jit)
        sel_f = sel.transpose(0, 2, 1, 3).reshape(B, k * S, E)
        pos = jnp.cumsum(sel_f, axis=1) - sel_f          # (B, kS, E) 0-based
        keep = (sel_f * (pos < C)).astype(x.dtype)       # overflow dropped
        # dispatch one-hot over capacity slots: (B, kS, E, C)
        disp_f = keep[..., None] * jax.nn.one_hot(pos, C, dtype=x.dtype)
        disp = disp_f.reshape(B, k, S, E, C)
        # combine weights: the (renormalized) gate of each kept choice
        comb = jnp.einsum("bksec,bsk->bsec",
                          disp, topg.astype(x.dtype))    # (B, S, E, C)
        dispatch = jnp.sum(disp, axis=1)                 # (B, S, E, C) 0/1

        # --- expert compute: stacked weights, leading expert axis ----------
        wi = self.param("wi", stacked_xavier_uniform,
                        (E, D, self.hidden_features)).astype(self.dtype)
        bi = self.param("bi", zeros_init,
                        (E, self.hidden_features)).astype(self.dtype)
        wo = self.param("wo", stacked_xavier_uniform,
                        (E, self.hidden_features,
                         self.out_features)).astype(self.dtype)
        bo = self.param("bo", zeros_init,
                        (E, self.out_features)).astype(self.dtype)

        xe = jnp.einsum("bsec,bsd->ebcd", dispatch, x)   # (E, B, C, D)
        h = jnp.einsum("ebcd,edh->ebch", xe, wi) + bi[:, None, None, :]
        h = nn.gelu(h, approximate=True)
        ye = jnp.einsum("ebch,ehd->ebcd", h, wo) + bo[:, None, None, :]
        y = jnp.einsum("bsec,ebcd->bsd", comb, ye)       # (B, S, D)
        y = y.astype(x.dtype)

        # --- aux losses (training only: collection must be mutable; during
        # init EVERY collection is mutable, so skip there or the sown values
        # would pollute the returned param tree) -----------------------------
        if self.is_mutable_collection("losses") and not self.is_initializing():
            # f_e from the top-1 choice (Switch eq. 4), p_e the mean prob
            f = jnp.mean(sel[..., 0, :].astype(jnp.float32), axis=(0, 1))
            p = jnp.mean(gates, axis=(0, 1))
            self.sow("losses", "load_balance", E * jnp.sum(f * p),
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
            z = jax.scipy.special.logsumexp(logits, axis=-1)
            self.sow("losses", "router_z", jnp.mean(z * z),
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
            # telemetry (not a loss): fraction of (token, choice) slots
            # dropped by the capacity limit — the number that decides
            # whether capacity_factor=1.25 is enough in practice
            dropped = 1.0 - jnp.sum(keep.astype(jnp.float32)) / (B * S * k)
            self.sow("losses", "dropped_frac", dropped,
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)
        return y
