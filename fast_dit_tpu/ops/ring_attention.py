"""Ring attention: exact self-attention over a sequence-sharded axis.

Sequence (context) parallelism is absent from the reference — its only
distribution strategy is batch data-parallelism over NCCL
(`/root/reference/train_options/train_baseline.py:117-124`, SURVEY.md §2.3)
— so this is TPU headroom beyond parity: it is the axis that lets one
sample's tokens span chips, which matters exactly where DiT gets expensive
(512²/1024² latents -> 1024/4096 tokens, and the attention FLOPs grow
quadratically while dp cannot cut per-sample latency at all).

The TPU formulation: each device holds a contiguous (B, S/n, H, hd) shard of
q, k and v. The outer loop is a `lax.scan` of n steps; every step computes
the local q block against the currently-resident k/v block, then rotates k/v
one hop around the ring with `lax.ppermute` — so the collective rides
neighbor ICI links and overlaps with the next step's matmuls under XLA's
async collective scheduling. After n steps k/v are back home and the
accumulated output is the global softmax(qk^T)v.

Two per-hop compute paths (same dispatch philosophy as
ops/flash_attention.py — the round-3 trace audit showed XLA's loss is
(B, H, S, S) score/probability traffic through HBM, which is exactly what a
plain-einsum hop materializes per hop per layer):

- **bf16 (the throughput path): Pallas hop kernels.** The repo's
  clamped-logit softmax (exp(min(s, 50)); exact whenever logits < 50, which
  LN-bounded DiT logits are) makes the per-hop partials ASSOCIATIVE with no
  running max: each hop emits unnormalized o_u = exp(s)v and the MXU
  ones-matmul row sums l, both fp32; the carry update is a plain add and
  the final normalization one divide. The (Sq, Sk) score matrix lives only
  in VMEM. A matching custom-VJP backward kernel recomputes the hop softmax
  flash-style (residual = q/k/v shards only) and emits dq/dk/dv without any
  HBM probability traffic — so sequence-parallel TRAINING also avoids the
  probs regime. Below the measured 2048-token forward crossover the hop is
  HYBRID (same split as the main attention): XLA forward (0.88x-faster at
  512/1024-token shards, benchmarks/ring_hop_bench.py) + the same Pallas
  backward.
- **fp32 (the parity path): XLA streaming online-softmax** with the running
  (o, m, l) triple — unconditionally exact for any input magnitude
  (tests/test_sequence.py pins it against `naive_attention` to fp32
  tolerance).

Differentiable end-to-end either way: scan + ppermute + einsum/custom_vjp
all have transpose rules (ppermute transposes to the reverse ring), so the
same code serves sequence-parallel training; gradients are pinned against
the dense ones.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _CLAMP, _VMEM_LIMIT, _chunks, _dot, _precision

__all__ = ["ring_attention"]

# finite stand-in for -inf: exp(_NEG - m) == 0 in fp32 while keeping the
# first-step softmax-correction gradients free of inf - inf
_NEG = -1e30

# largest per-shard sequence the hop kernels keep VMEM-resident; the
# backward is the binding side (q/k/v + fp32 dO + dq/dk/dv + per-head fp32
# dk/dv scratch ~ 93 MB at 4096 tokens, D=1152)
_HOP_MAX_SEQ = 4096


# ---------------------------------------------------------------------------
# Pallas hop kernels (bf16 path): unnormalized clamped-softmax block partials
# ---------------------------------------------------------------------------


def _hop_fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float,
                    num_heads: int):
    """One batch row of one ring hop: o_u = exp(min(s, _CLAMP)) v and the
    row sums l, per head. Heads are lane slices of the (S, D) tiles; row
    sums ride the MXU ones-matmul (no cross-lane VPU reductions — the
    measured 2.4x lesson from the main attention kernel)."""
    prec = _precision(q_ref.dtype)
    Sq, D = q_ref.shape
    Sk = k_ref.shape[0]
    hd = D // num_heads
    bq, nq = _chunks(Sq)
    dtype = q_ref.dtype
    ones = jnp.ones((Sk, 128), dtype)
    for j in range(num_heads):  # static unroll over lane-sliced heads
        hs = slice(j * hd, (j + 1) * hd)
        k = k_ref[:, hs]
        v = v_ref[:, hs]

        def chunk(c, _):
            q = q_ref[pl.ds(c * bq, bq), hs]
            s = _dot(q, k, ((1,), (1,)), prec) * scale
            p_u = jnp.exp(jnp.minimum(s, _CLAMP))
            pc = p_u.astype(dtype)
            o_ref[pl.ds(c * bq, bq), hs] = _dot(pc, v, ((1,), (0,)), prec)
            l_ref[pl.ds(c * bq, bq), j: j + 1] = _dot(
                pc, ones, ((1,), (0,)), prec)[:, :1]
            return _

        if nq == 1:
            chunk(0, None)
        else:
            jax.lax.fori_loop(0, nq, chunk, None)


def _hop_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dl_ref,
                    dq_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale: float, num_heads: int):
    """dq/dk/dv of one hop's (o_u, l) given fp32 cotangents (do, dl): the
    hop softmax is recomputed in VMEM (flash-style — residual is just the
    q/k/v shards), dk/dv accumulated over q-chunks in per-head fp32 scratch.

    With u = q k^T and s = u*scale: d exp(min(s, C))/ds = p_u * [s < C], so
        dv = p_u^T do
        dp_u = do v^T + dl
        du = p_u * [s < C] * dp_u * scale
        dq = du k,   dk = du^T q.
    """
    prec = _precision(q_ref.dtype)
    Sq, D = q_ref.shape
    Sk = k_ref.shape[0]
    hd = D // num_heads
    bq, nq = _chunks(Sq)
    dtype = q_ref.dtype
    for j in range(num_heads):
        hs = slice(j * hd, (j + 1) * hd)
        k = k_ref[:, hs]
        v = v_ref[:, hs]
        dk_acc[...] = jnp.zeros((Sk, hd), dk_acc.dtype)
        dv_acc[...] = jnp.zeros((Sk, hd), dv_acc.dtype)

        def chunk(c, _):
            q = q_ref[pl.ds(c * bq, bq), hs]
            do = do_ref[pl.ds(c * bq, bq), hs]        # fp32
            dl = dl_ref[pl.ds(c * bq, bq), j: j + 1]  # fp32 (bq, 1)
            s = _dot(q, k, ((1,), (1,)), prec) * scale
            p_u = jnp.exp(jnp.minimum(s, _CLAMP))
            pc = p_u.astype(dtype)
            doc = do.astype(dtype)
            dv_acc[...] += _dot(pc, doc, ((0,), (0,)), prec)
            dp = _dot(doc, v, ((1,), (1,)), prec) + dl
            du = jnp.where(s < _CLAMP, p_u * dp, 0.0) * scale
            duc = du.astype(dtype)
            dq_ref[pl.ds(c * bq, bq), hs] = _dot(
                duc, k, ((1,), (0,)), prec).astype(dq_ref.dtype)
            dk_acc[...] += _dot(duc, q, ((0,), (0,)), prec)
            return _

        if nq == 1:
            chunk(0, None)
        else:
            jax.lax.fori_loop(0, nq, chunk, None)
        dk_ref[:, hs] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[:, hs] = dv_acc[...].astype(dv_ref.dtype)


def _hop_forward(q, kb, vb, scale, num_heads):
    B, Sq, D = q.shape
    Sk = kb.shape[1]
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        functools.partial(_hop_fwd_kernel, scale=scale, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((B, Sq, D), jnp.float32),
                   jax.ShapeDtypeStruct((B, Sq, num_heads), jnp.float32)),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, Sq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((None, Sq, D), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, Sq, num_heads), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * Sq * Sk * D,
            bytes_accessed=(3 * B * Sk * D * q.dtype.itemsize
                            + 4 * B * Sq * D),
            transcendentals=B * Sq * Sk * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, kb, vb)


def _hop_backward(q, kb, vb, do, dl, scale, num_heads):
    B, Sq, D = q.shape
    Sk = kb.shape[1]
    hd = D // num_heads
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_hop_bwd_kernel, scale=scale, num_heads=num_heads),
        out_shape=(jax.ShapeDtypeStruct((B, Sq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Sk, D), kb.dtype),
                   jax.ShapeDtypeStruct((B, Sk, D), vb.dtype)),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, Sq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sq, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, Sq, num_heads), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((None, Sq, D), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((None, Sk, D), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((Sk, hd), jnp.float32),  # per-head dk accumulator
            pltpu.VMEM((Sk, hd), jnp.float32),  # per-head dv accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * B * Sq * Sk * D,
            bytes_accessed=(6 * B * Sk * D * q.dtype.itemsize
                            + 4 * B * Sq * D),
            transcendentals=B * Sq * Sk * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(q, kb, vb, do, dl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_hop(q, kb, vb, scale, num_heads):
    """One ring hop's unnormalized partials: (o_u fp32 (B,Sq,D),
    l fp32 (B,Sq,H)). q/kb/vb are flat (B, S, H*hd) shards."""
    return _hop_forward(q, kb, vb, scale, num_heads)


def _ring_hop_fwd(q, kb, vb, scale, num_heads):
    return _hop_forward(q, kb, vb, scale, num_heads), (q, kb, vb)


def _ring_hop_bwd(scale, num_heads, res, cts):
    q, kb, vb = res
    do, dl = cts
    return _hop_backward(q, kb, vb, do.astype(jnp.float32),
                         dl.astype(jnp.float32), scale, num_heads)


_ring_hop.defvjp(_ring_hop_fwd, _ring_hop_bwd)


def _hop_xla_forward(q, kb, vb, scale, num_heads):
    """The SAME clamped unnormalized hop contract as _hop_forward, in plain
    XLA: below the Pallas crossover the (Sq, Sk) scores fit XLA's fused
    attention regime and its forward is faster (measured
    benchmarks/ring_hop_bench.py: 0.88x Pallas at 512/1024-token shards)."""
    B, Sq, D = q.shape
    hd = D // num_heads
    qh = q.reshape(B, Sq, num_heads, hd)
    kh = kb.reshape(B, kb.shape[1], num_heads, hd)
    vh = vb.reshape(B, vb.shape[1], num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    p_u = jnp.exp(jnp.minimum(s, _CLAMP))
    o = jnp.einsum("bhqk,bkhd->bqhd", p_u.astype(q.dtype), vh,
                   preferred_element_type=jnp.float32)
    l = p_u.sum(axis=-1).transpose(0, 2, 1)  # (B, Sq, H) fp32
    return o.reshape(B, Sq, D), l


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_hop_hybrid(q, kb, vb, scale, num_heads):
    """Hybrid hop: XLA forward (faster below the crossover) + the fused
    Pallas backward (no saved/re-read HBM probabilities) — the same
    split the main attention uses (ops/flash_attention.py 'hybrid')."""
    return _hop_xla_forward(q, kb, vb, scale, num_heads)


def _ring_hop_hybrid_fwd(q, kb, vb, scale, num_heads):
    return _hop_xla_forward(q, kb, vb, scale, num_heads), (q, kb, vb)


_ring_hop_hybrid.defvjp(_ring_hop_hybrid_fwd, _ring_hop_bwd)


# Pallas-forward crossover (measured, benchmarks/ring_hop_bench.py /
# performance/v5e/ring_hop_bench.jsonl): XLA's hop forward wins below
# 2048-token shards, the VMEM-resident Pallas forward wins above. The
# backward is the Pallas kernel either way.
_HOP_PALLAS_FWD_MIN_SEQ = 2048


def _ring_pallas(q, k, v, *, axis: str, scale: float, n: int):
    """bf16 ring attention with the Pallas hop kernels (see module doc)."""
    B, Sq, H, hd = q.shape
    D = H * hd
    # one flat relayout per tensor, outside the scan (hd=72 pads to 128 in
    # the 4D layout, so this is a real copy — amortized over n hops)
    qf = q.reshape(B, Sq, D)
    kf = k.reshape(B, Sq, D)
    vf = v.reshape(B, Sq, D)
    perm = [(i, (i + 1) % n) for i in range(n)]
    hop = _ring_hop if Sq >= _HOP_PALLAS_FWD_MIN_SEQ else _ring_hop_hybrid

    def step(carry, _):
        o, l, kb, vb = carry
        ob, lb = hop(qf, kb, vb, scale, H)
        o = o + ob
        l = l + lb
        kb = lax.ppermute(kb, axis, perm)
        vb = lax.ppermute(vb, axis, perm)
        return (o, l, kb, vb), None

    o0 = jnp.zeros((B, Sq, D), jnp.float32)
    l0 = jnp.zeros((B, Sq, H), jnp.float32)
    (o, l, _, _), _ = lax.scan(step, (o0, l0, kf, vf), None, length=n)
    out = o.reshape(B, Sq, H, hd) / jnp.maximum(l, 1e-30)[..., None]
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# fp32 path: XLA streaming online softmax (unconditionally exact)
# ---------------------------------------------------------------------------


def _ring_xla(q, k, v, *, axis: str, scale: float, n: int):
    B, Sq, H, hd = q.shape
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


def ring_attention(q, k, v, *, axis: str, scale=None):
    """Exact attention over a sequence axis sharded as `axis` (shard_map).

    q, k, v: (B, S_local, H, hd) — the local shard of a (B, n*S_local, H, hd)
    global sequence, shards laid out contiguously in ring order (device i
    holds tokens [i*S_local, (i+1)*S_local)). Returns the local (B, S_local,
    H, hd) shard of the exact global attention output.

    bf16 inputs with lane-aligned model dim (H*hd % 128 == 0, every DiT
    config) take the Pallas hop kernels; everything else takes the XLA
    streaming path. Must be called inside `shard_map` (or any context where
    `axis` is a bound mesh axis name).
    """
    n = lax.psum(1, axis)  # static axis size
    B, Sq, H, hd = q.shape
    scale = float(hd ** -0.5 if scale is None else scale)
    if (q.dtype == jnp.bfloat16 and (H * hd) % 128 == 0
            and Sq <= _HOP_MAX_SEQ):
        return _ring_pallas(q, k, v, axis=axis, scale=scale, n=n)
    return _ring_xla(q, k, v, axis=axis, scale=scale, n=n)
