"""Pallas TPU flash attention: online-softmax forward + fused backward.

The reference delegates attention to timm's naive softmax(QK^T)V
(`/root/reference/train_options/models_original.py:108`). This is the
TPU-native replacement:

- Forward: a K/V-blocked online-softmax kernel (grid = (batch*heads,
  q-blocks, k-blocks)). Running max/denominator live in VMEM scratch, so
  VMEM usage is bounded by the block sizes, not the sequence length — DiT's
  256 (256^2, patch 2) and 1024 (512^2) token configs run single-K-block;
  longer sequences stream K/V blocks through the same kernel.
- Backward: one fused Pallas kernel per (batch, head) recomputes the softmax
  (flash-style: only q/k/v are saved as residuals) and produces dq, dk, dv
  in a single pass, streaming q blocks while dk/dv accumulate in fp32 VMEM
  scratch. Sequences longer than `_BWD_MAX_SEQ` fall back to an XLA
  recompute VJP.

Numerics: logits and softmax statistics in fp32 (matching the fp32 softmax
the reference gets from timm/torch); matmuls in the input dtype on the MXU
with fp32 accumulation; fp32 inputs get full-precision MXU passes (this is
also the high-precision parity path — see tools/parity_check.py). Head dim
is zero-padded to the 128-lane width: zero K-columns leave logits unchanged,
zero V-columns produce zero output columns that are sliced away; padded key
rows are masked to -inf before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

_LANE = 128
# largest KV length the fused backward keeps resident per (batch, head);
# beyond this an XLA recompute VJP takes over (not a DiT config: DiT tops
# out at 1024 tokens for 512^2 / patch 2)
_BWD_MAX_SEQ = 4096


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _precision(dtype):
    # fp32 inputs get full-precision MXU passes (the fp32-parity path);
    # bf16 inputs take the fast path
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _prep(x, s_to, dp):
    """(B, S, H, D) -> (B*H, s_to, dp), zero-padded."""
    B, S, H, D = x.shape
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * H, S, D)
    return jnp.pad(x, ((0, 0), (0, s_to - S), (0, dp - D)))


def _unprep(x, B, S, H, D):
    """(B*H, sq, dp) -> (B, S, H, D), padding sliced away."""
    x = x[:, :S, :D].reshape(B, H, S, D)
    return jnp.transpose(x, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref, *,
                scale: float, kv_len: int, block_k: int):
    """Online-softmax step for one (bh, q-block, k-block) grid cell."""
    kk = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(kk == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    prec = _precision(q.dtype)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec) * scale  # (bq, bk)
    if kv_len % block_k:
        # mask padded key rows so they contribute nothing to the softmax
        col = kk * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)

    m_prev = m_ref[:, :1]                                   # (bq, 1)
    l_prev = l_ref[:, :1]
    m_curr = jnp.max(s, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)                    # finite: every
    # k-block overlaps valid keys (padding < block_k), so exp() below is safe
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next)
    l_ref[...] = jnp.broadcast_to(
        alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True), l_ref.shape)
    m_ref[...] = jnp.broadcast_to(m_next, m_ref.shape)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(kk == nk - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] / l_ref[:, :1]).astype(o_ref.dtype)


def _forward(q, k, v, scale):
    """q/k/v: (B, S, H, D) -> (B, S, H, D)."""
    B, S, H, D = q.shape
    dp = _round_up(D, _LANE)
    bq = min(_round_up(S, 16), 256)
    sq = _round_up(S, bq)
    bk = min(_round_up(S, _LANE), 1024)
    sk = _round_up(S, bk)

    qp = _prep(q, sq, dp)
    kp = _prep(k, sk, dp)
    vp = _prep(v, sk, dp)

    grid = (B * H, sq // bq, sk // bk)
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=S, block_k=bk),
        out_shape=jax.ShapeDtypeStruct((B * H, sq, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, dp), jnp.float32),      # output accumulator
            pltpu.VMEM((bq, _LANE), jnp.float32),   # running max
            pltpu.VMEM((bq, _LANE), jnp.float32),   # running denominator
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * H * sq * sk * dp,
            bytes_accessed=(B * H * (sq + 2 * sk) * dp + B * H * sq * dp)
            * q.dtype.itemsize,
            transcendentals=B * H * sq * sk,
        ),
        interpret=interpret,
    )(qp, kp, vp)

    return _unprep(out, B, S, H, D)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                dk_acc, dv_acc, *, scale: float, kv_len: int):
    """dq/dk/dv for one (bh, q-block); K/V resident, softmax recomputed.

    Zero-padded q rows carry zero dO rows, so their (finite, uniform) softmax
    rows contribute nothing to dk/dv; padded key rows are masked to -inf.
    """
    j = pl.program_id(1)
    nq = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    prec = _precision(q.dtype)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec) * scale  # (bq, sk)
    if kv_len != k.shape[0]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)               # (bq, sk) fp32

    pc = p.astype(v.dtype)
    dv_acc[...] += jax.lax.dot_general(                       # p^T dO
        pc, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    dp = jax.lax.dot_general(                                 # dO v^T
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)           # rowsum(p dp)
    ds = (p * (dp - delta) * scale).astype(q.dtype)           # (bq, sk)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec).astype(dq_ref.dtype)
    dk_acc[...] += jax.lax.dot_general(                       # ds^T q
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)

    @pl.when(j == nq - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _backward(q, k, v, g, scale):
    B, S, H, D = q.shape
    dp = _round_up(D, _LANE)
    bq = min(_round_up(S, 16), 256)
    sq = _round_up(S, bq)
    sk = _round_up(S, _LANE)

    qp = _prep(q, sq, dp)
    kp = _prep(k, sk, dp)
    vp = _prep(v, sk, dp)
    gp = _prep(g.astype(q.dtype), sq, dp)

    grid = (B * H, sq // bq)
    interpret = jax.default_backend() != "tpu"
    blk = jax.ShapeDtypeStruct((B * H, sq, dp), q.dtype)
    blk_kv = jax.ShapeDtypeStruct((B * H, sk, dp), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, kv_len=S),
        out_shape=(blk, blk_kv, blk_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((sk, dp), jnp.float32),   # dk accumulator
            pltpu.VMEM((sk, dp), jnp.float32),   # dv accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * 2 * B * H * sq * sk * dp,
            bytes_accessed=4 * B * H * (sq + sk) * dp * q.dtype.itemsize,
            transcendentals=B * H * sq * sk,
        ),
        interpret=interpret,
    )(qp, kp, vp, gp)

    return (_unprep(dq, B, S, H, D).astype(q.dtype),
            _unprep(dk, B, S, H, D).astype(k.dtype),
            _unprep(dv, B, S, H, D).astype(v.dtype))


def _xla_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, scale):
    return _forward(q, k, v, scale)


def _flash_fwd(q, k, v, scale):
    # flash-style residuals: only the inputs; softmax recomputed in backward
    return _forward(q, k, v, scale), (q, k, v)


def _flash_bwd(scale, res, g):
    q, k, v = res
    if q.shape[1] > _BWD_MAX_SEQ:
        # K/V no longer fit per (batch, head); recompute in XLA instead
        _, vjp = jax.vjp(
            lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
        return vjp(g)
    return _backward(q, k, v, g, scale)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, scale=None):
    """Attention over (B, S, H, D) inputs: Pallas forward and backward."""
    D = q.shape[-1]
    scale = float(D ** -0.5 if scale is None else scale)
    return _flash(q, k, v, scale)
