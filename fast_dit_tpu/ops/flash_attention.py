"""Pallas TPU attention kernel for DiT-scale sequences.

DiT sequence lengths are small and static — 256 tokens (256^2, patch 2) to
1024 (512^2) — so the kernel keeps K/V for one (batch, head) resident in VMEM
and computes exact softmax over the full row per query block (no online
rescaling needed at these lengths; K/V tiles are a few hundred KB against
~16 MB VMEM). Head dim is zero-padded to the 128-lane width: zero K-columns
leave logits unchanged, zero V-columns produce zero output columns that are
sliced away.

Numerics: logits and softmax in fp32 (matching the fp32 softmax the reference
gets from timm/torch), output in the input dtype. The backward pass is an XLA
recompute (flash-style rematerialization) via custom_vjp, so the op is fully
differentiable; a Pallas backward is a later optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_LANE = 128


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    # q: (bq, dp), k/v: (S, dp) for one (batch, head); dp = padded head dim
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # fp32 inputs get full-precision MXU passes (the fp32-parity path);
    # bf16 inputs take the fast path
    precision = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ) * scale                                          # (bq, S) fp32
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _forward(q, k, v, scale):
    """q/k/v: (B, S, H, D) -> (B, S, H, D)."""
    B, S, H, D = q.shape
    dp = _round_up(D, _LANE)
    bq = min(_round_up(S, 8), 256)
    sq = _round_up(S, bq)

    def prep(x, s_to):
        # (B, S, H, D) -> (B*H, s_to, dp), zero-padded
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, S, D)
        return jnp.pad(x, ((0, 0), (0, s_to - S), (0, dp - D)))

    qp = prep(q, sq)
    kp = prep(k, S)  # keys/values keep true length; padded queries are junk rows
    vp = prep(v, S)

    grid = (B * H, sq // bq)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, sq, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * sq * S * dp,
            bytes_accessed=(B * H * (sq + 2 * S) * dp + B * H * sq * dp)
            * q.dtype.itemsize,
            transcendentals=B * H * sq * S,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    out = out[:, :S, :D].reshape(B, H, S, D)
    return jnp.transpose(out, (0, 2, 1, 3))


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _forward(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    return _forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    # flash-style rematerialization: recompute attention in XLA and let it
    # differentiate; activations were never stored
    q, k, v = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, scale=None):
    """Attention over (B, S, H, D) inputs with a VMEM-resident Pallas kernel."""
    D = q.shape[-1]
    scale = float(D ** -0.5 if scale is None else scale)
    return _flash(q, k, v, scale)
