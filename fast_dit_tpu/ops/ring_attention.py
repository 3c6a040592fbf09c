"""Ring attention: exact self-attention over a sequence-sharded axis.

Sequence (context) parallelism is absent from the reference — its only
distribution strategy is batch data-parallelism over NCCL
(`/root/reference/train_options/train_baseline.py:117-124`, SURVEY.md §2.3)
— so this is TPU headroom beyond parity: it is the axis that lets one
sample's tokens span chips, which matters exactly where DiT gets expensive
(512²/1024² latents -> 1024/4096 tokens, and the attention FLOPs grow
quadratically while dp cannot cut per-sample latency at all).

The TPU formulation: each device holds a contiguous (B, S/n, H, hd) shard of
q, k and v. The kernel is a `lax.scan` of n steps; every step computes the
local q block against the currently-resident k/v block with the standard
online-softmax running triple (o, m, l) in fp32, then rotates k/v one hop
around the ring with `lax.ppermute` — so the collective rides neighbor ICI
links and overlaps with the next step's matmuls under XLA's async collective
scheduling. After n steps k/v are back home and (o / l) is the EXACT
softmax(qk^T)v — this is an exact algorithm, not an approximation
(tests/test_sequence.py pins it against `naive_attention` to fp32 tolerance).

Differentiable end-to-end: scan + ppermute + einsum all have transpose
rules (ppermute transposes to the reverse ring), so the same code serves
sequence-parallel training; gradients are pinned against the dense ones.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

__all__ = ["ring_attention"]

# finite stand-in for -inf: exp(_NEG - m) == 0 in fp32 while keeping the
# first-step softmax-correction gradients free of inf - inf
_NEG = -1e30


def ring_attention(q, k, v, *, axis: str, scale=None):
    """Exact attention over a sequence axis sharded as `axis` (shard_map).

    q, k, v: (B, S_local, H, hd) — the local shard of a (B, n*S_local, H, hd)
    global sequence, shards laid out contiguously in ring order (device i
    holds tokens [i*S_local, (i+1)*S_local)). Returns the local (B, S_local,
    H, hd) shard of the exact global attention output.

    Must be called inside `shard_map` (or any context where `axis` is a
    bound mesh axis name).
    """
    n = lax.psum(1, axis)  # static axis size
    B, Sq, H, hd = q.shape
    scale = hd ** -0.5 if scale is None else scale
    qf = (q.astype(jnp.float32) * scale).transpose(0, 2, 1, 3)  # (B, H, Sq, hd)

    # one hop around the ring; after n steps k/v are back on their home chip
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        o, m, l, kb, vb = carry
        kf = kb.astype(jnp.float32).transpose(0, 2, 1, 3)
        vf = vb.astype(jnp.float32).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        corr = jnp.exp(m - m_new)
        l_new = l * corr + p.sum(axis=-1)
        o_new = o * corr[..., None] + jnp.einsum("bhqk,bhkd->bhqd", p, vf)
        kb = lax.ppermute(kb, axis, perm)
        vb = lax.ppermute(vb, axis, perm)
        return (o_new, m_new, l_new, kb, vb), None

    o0 = jnp.zeros((B, H, Sq, hd), jnp.float32)
    m0 = jnp.full((B, H, Sq), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Sq), jnp.float32)
    (o, _, l, _, _), _ = lax.scan(step, (o0, m0, l0, k, v), None, length=n)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)
