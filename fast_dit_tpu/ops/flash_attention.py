"""Pallas TPU attention: layout-native packed-qkv kernels + fused backward.

The reference delegates attention to timm's naive softmax(QK^T)V
(`/root/reference/train_options/models_original.py:108`). On TPU the
interesting structure is asymmetric, and this module exploits it (profile
evidence in docs/ABLATIONS.md round-3 trace tables):

- **Forward, short sequences (256 tokens = the flagship 256^2/p2 config)**:
  XLA already compiles softmax(QK^T)V into a single VMEM-resident fusion
  running at ~80% of the chip's flops peak (~24 us/layer at sampling batch
  16 — measured vs a 24 us flops-bound ideal). A hand kernel CANNOT
  meaningfully beat it there, and ours measured 4-10x slower (the
  per-head VPU softmax serializes against the MXU). So the forward stays
  with XLA below `_PALLAS_FWD_MIN_SEQ`.
- **Backward**: XLA's attention VJP materializes and re-reads the
  (B, H, S, S) probability matrices through HBM (the round-3 train-step
  trace attributes ~130 ms/step of 745 GB/s bandwidth-bound remat fusions
  to them at XL/2 bs128). The fused Pallas backward here recomputes the
  softmax in VMEM (flash-style — residual is just the packed qkv) and
  writes the packed dqkv in one sweep: that traffic disappears.

Hence the default is the **hybrid** path: XLA forward + Pallas fused
backward, glued with jax.custom_vjp. The full-Pallas forward is kept for
long sequences (>= 512 tokens, e.g. 1024 at 512^2) where the score matrix
is large enough that XLA's materializing forward loses.

Layout: the kernels consume the fused qkv projection output directly.
(B, S, 3, H, hd) is viewed as (B, S, 3*H*hd) — a free reshape of contiguous
trailing dims, 128-lane aligned for every DiT config — so the whole packed
qkv is ONE full-width (S, 3D) block per batch row, and q/k/v and the
individual heads are static lane slices inside VMEM. No prep transposes in
HBM (the round-2 kernel's (B*H, S, 128)-padded prep/unprep copies are gone).

Numerics, two in-kernel softmax strategies selected by input dtype:

- fp32 inputs (the parity path, tools/parity_check.py): exact row-max
  softmax with full-precision MXU passes.
- bf16 inputs (training/sampling): a reduction-free softmax. Cross-lane
  VPU reductions (row max, row sum) dominate the kernel's runtime at DiT
  shapes (measured: removing them is 2.4x), so the fast path
  - clamps logits at +50 instead of subtracting the row max (exact
    whenever all logits are < 50 — DiT logits are LN-bounded; beyond the
    clamp the softmax degrades gracefully rather than overflowing),
  - computes row sums as an MXU matmul against a ones matrix,
  - folds the 1/denominator into the small (rows, head_dim) tensors
    (output / dO / q) instead of normalizing the (rows, S) probabilities.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention", "flash_attention_qkv", "flash_attention_qkv_flat"]

# largest seq kept resident per batch row ((S, 3D) block + fp32 scratch);
# DiT tops out at 1024 (512^2, patch 2). The backward additionally holds
# dqkv + fp32 dk/dv scratch, so its resident bound is lower.
_MAX_SEQ = 2048
_BWD_MAX_SEQ = 1024
# below this, the XLA forward fusion is at flops-peak and unbeatable
_PALLAS_FWD_MIN_SEQ = 512
_CHUNK = 256  # q-chunk rows of the in-kernel score matrices when S > _CHUNK
# logits clamp of the reduction-free bf16 softmax (exp(50) ~ 5e21: safely
# inside fp32/bf16 range even after a 2048-term row sum)
_CLAMP = 50.0
# The statically-unrolled head loop does NOT share stack allocations between
# iterations, so per-head fp32 score temporaries are sized by _CHUNK and the
# kernel needs more than the default 16 MB scoped-VMEM budget at S >= 1024
# (measured: 101 MB stack at S=1024 with 512-row chunks).
_VMEM_LIMIT = 100 * 1024 * 1024


def _precision(dtype):
    # fp32 inputs get full-precision MXU passes (the fp32-parity path);
    # bf16 inputs take the fast path
    return (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)


def _chunks(S: int):
    """(chunk_rows, n_chunks) for the in-kernel q loop."""
    if S <= _CHUNK or S % _CHUNK:
        return S, 1
    return _CHUNK, S // _CHUNK


def _supported(S: int, D: int) -> bool:
    return S <= _MAX_SEQ and (3 * D) % 128 == 0


def _dot(a, b, dims, prec):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _unnormalized_softmax(s, dtype, prec, ones):
    """exp(clamp(s)) and 1/rowsum without cross-lane reductions.

    Returns (p_u, inv) where the true probabilities are p_u * inv. The row
    sum rides the MXU: exp(s) @ ones(S, 128), column 0.
    """
    p_u = jnp.exp(jnp.minimum(s, _CLAMP))
    denom = _dot(p_u.astype(dtype), ones, ((1,), (0,)), prec)[:, :1]
    inv = 1.0 / jnp.maximum(denom, 1e-30)
    return p_u, inv


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(qkv_ref, o_ref, *, scale: float, num_heads: int, D: int,
                exact: bool):
    """softmax(q k^T) v for one batch row; the ref is the full (S, 3D)
    packed tile, heads are lane slices at [j*hd], k at [D + j*hd], v at
    [2D + j*hd]."""
    prec = _precision(qkv_ref.dtype)
    S = qkv_ref.shape[0]
    hd = D // num_heads
    bq, n = _chunks(S)
    dtype = qkv_ref.dtype
    ones = None if exact else jnp.ones((S, 128), dtype)
    for j in range(num_heads):  # static unroll over lane-sliced heads
        k = qkv_ref[:, D + j * hd: D + (j + 1) * hd]
        v = qkv_ref[:, 2 * D + j * hd: 2 * D + (j + 1) * hd]

        def chunk(c, _):
            q = qkv_ref[pl.ds(c * bq, bq), j * hd: (j + 1) * hd]
            s = _dot(q, k, ((1,), (1,)), prec) * scale
            if exact:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = _dot(p.astype(v.dtype), v, ((1,), (0,)), prec)
            else:
                p_u, inv = _unnormalized_softmax(s, dtype, prec, ones)
                o = _dot(p_u.astype(dtype), v, ((1,), (0,)), prec) * inv
            o_ref[pl.ds(c * bq, bq), j * hd: (j + 1) * hd] = o.astype(o_ref.dtype)
            return _

        if n == 1:
            chunk(0, None)  # flagship 256-token case: no loop machinery
        else:
            # real loop (not unrolled): one chunk's fp32 score temporaries
            # live at a time per head
            jax.lax.fori_loop(0, n, chunk, None)


def _forward(qkv, scale, num_heads):
    """(B, S, 3D) -> (B, S, D)."""
    B, S, threeD = qkv.shape
    D = threeD // 3
    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, num_heads=num_heads, D=D,
                          exact=qkv.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, S, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * B * S * S * D,
            bytes_accessed=4 * B * S * D * qkv.dtype.itemsize,
            transcendentals=B * S * S * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(qkv_ref, do_ref, dqkv_ref, dk_acc, dv_acc, *,
                scale: float, num_heads: int, D: int, exact: bool):
    """Packed dqkv for one batch row: softmax recomputed from q/k/v
    (flash-style — no saved probabilities), dk/dv accumulated over q-chunks
    in fp32 scratch and written into the packed output's k/v lane regions.

    Fast (bf16) path keeps the (rows, S) tensors unnormalized and folds the
    1/denominator into dO (for dV), q (for dK) and dQ — all (rows, head_dim)
    sized — so no (rows, S) normalization pass and no cross-lane reductions
    exist anywhere (delta = rowsum(p*dp) also rides the MXU ones-matmul).
    """
    prec = _precision(qkv_ref.dtype)
    S = qkv_ref.shape[0]
    hd = D // num_heads
    bq, n = _chunks(S)
    dtype = qkv_ref.dtype
    ones = None if exact else jnp.ones((S, 128), dtype)
    for j in range(num_heads):
        hs = slice(j * hd, (j + 1) * hd)
        k = qkv_ref[:, D + j * hd: D + (j + 1) * hd]
        v = qkv_ref[:, 2 * D + j * hd: 2 * D + (j + 1) * hd]
        dk_acc[:, hs] = jnp.zeros((S, hd), dk_acc.dtype)
        dv_acc[:, hs] = jnp.zeros((S, hd), dv_acc.dtype)

        def chunk(c, _):
            q = qkv_ref[pl.ds(c * bq, bq), hs]
            do = do_ref[pl.ds(c * bq, bq), hs]
            s = _dot(q, k, ((1,), (1,)), prec) * scale
            if exact:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)   # (bq, S) fp32
                pc = p.astype(dtype)
                dv_acc[:, hs] += _dot(pc, do, ((0,), (0,)), prec)  # p^T dO
                dp = _dot(do, v, ((1,), (1,)), prec)               # dO v^T
                delta = jnp.sum(p * dp, axis=-1, keepdims=True)
                ds = (p * (dp - delta) * scale).astype(dtype)      # (bq, S)
                dq = _dot(ds, k, ((1,), (0,)), prec)
                dqkv_ref[pl.ds(c * bq, bq), hs] = dq.astype(dqkv_ref.dtype)
                dk_acc[:, hs] += _dot(ds, q, ((0,), (0,)), prec)   # ds^T q
            else:
                p_u, inv = _unnormalized_softmax(s, dtype, prec, ones)
                pc = p_u.astype(dtype)
                # dV = p^T dO = p_u^T (dO * inv): scale the small tensor
                do_s = (do.astype(jnp.float32) * inv).astype(dtype)
                dv_acc[:, hs] += _dot(pc, do_s, ((0,), (0,)), prec)
                dp = _dot(do, v, ((1,), (1,)), prec)               # dO v^T
                # delta = rowsum(p * dp) = inv * rowsum(p_u * dp) via MXU
                pd = p_u * dp                                      # (bq, S)
                delta = _dot(pd.astype(dtype), ones,
                             ((1,), (0,)), prec)[:, :1] * inv
                # true ds = inv * p_u * (dp - delta) * scale; keep ds_u
                # unnormalized and fold (inv*scale) into the hd-sized sides
                ds_u = (p_u * (dp - delta)).astype(dtype)          # (bq, S)
                dq = _dot(ds_u, k, ((1,), (0,)), prec) * (inv * scale)
                dqkv_ref[pl.ds(c * bq, bq), hs] = dq.astype(dqkv_ref.dtype)
                q_s = (q.astype(jnp.float32) * (inv * scale)).astype(dtype)
                dk_acc[:, hs] += _dot(ds_u, q_s, ((0,), (0,)), prec)
            return _

        if n == 1:
            chunk(0, None)
        else:
            jax.lax.fori_loop(0, n, chunk, None)
        dqkv_ref[:, D + j * hd: D + (j + 1) * hd] = (
            dk_acc[:, hs].astype(dqkv_ref.dtype))
        dqkv_ref[:, 2 * D + j * hd: 2 * D + (j + 1) * hd] = (
            dv_acc[:, hs].astype(dqkv_ref.dtype))


def _backward(qkv, g, scale, num_heads):
    B, S, threeD = qkv.shape
    D = threeD // 3
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, num_heads=num_heads, D=D,
                          exact=qkv.dtype == jnp.float32),
        out_shape=jax.ShapeDtypeStruct((B, S, threeD), qkv.dtype),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, S, threeD), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, S, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, S, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, D), jnp.float32),   # dk accumulator
            pltpu.VMEM((S, D), jnp.float32),   # dv accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=5 * 2 * B * S * S * D,
            bytes_accessed=8 * B * S * D * qkv.dtype.itemsize,
            transcendentals=B * S * S * num_heads,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(qkv, g.astype(qkv.dtype))


# ---------------------------------------------------------------------------
# entry points
# ---------------------------------------------------------------------------


def _xla_attention_qkv(qkv, scale, num_heads):
    B, S, threeD = qkv.shape
    D = threeD // 3
    hd = D // num_heads
    qkv = qkv.reshape(B, S, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(B, S, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash(qkv, scale, num_heads):
    return _forward(qkv, scale, num_heads)


def _flash_fwd(qkv, scale, num_heads):
    # flash-style residuals: just the packed input; softmax recomputed in bwd
    return _forward(qkv, scale, num_heads), qkv


def _flash_bwd(scale, num_heads, qkv, g):
    return (_backward(qkv, g, scale, num_heads),)


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _hybrid(qkv, scale, num_heads):
    # XLA's short-seq forward fusion is at flops peak — keep it; the win is
    # the fused Pallas backward (no (B,H,S,S) probs through HBM)
    return _xla_attention_qkv(qkv, scale, num_heads)


def _hybrid_fwd(qkv, scale, num_heads):
    return _xla_attention_qkv(qkv, scale, num_heads), qkv


_hybrid.defvjp(_hybrid_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _flash_fwd_only(qkv, scale, num_heads):
    # Pallas forward, XLA-recompute backward: for (_BWD_MAX_SEQ, _MAX_SEQ]
    # where the fused backward's dqkv + fp32 dk/dv scratch exceed VMEM
    return _forward(qkv, scale, num_heads)


def _flash_fwd_only_fwd(qkv, scale, num_heads):
    return _forward(qkv, scale, num_heads), qkv


def _flash_fwd_only_bwd(scale, num_heads, qkv, g):
    _, vjp = jax.vjp(lambda x: _xla_attention_qkv(x, scale, num_heads), qkv)
    return vjp(g)


_flash_fwd_only.defvjp(_flash_fwd_only_fwd, _flash_fwd_only_bwd)


def flash_attention_qkv_flat(flat, num_heads: int, *, scale=None,
                             fwd_impl: str = "auto"):
    """Attention over a FLAT packed (B, S, 3*H*hd) qkv tensor -> (B, S, H*hd).

    The zero-copy entry point: the (S, 3D) minor dim is lane-aligned, so no
    relayout happens on either side. The 5D (B, S, 3, H, hd) projection
    layout is NOT physically flat on TPU — hd=72 pads to 128 lanes, so
    reshaping it costs a full HBM round trip of the qkv tensor per call
    (measured 19 ms/step at XL/2 bs128; see docs/ABLATIONS.md). The flat
    projection in models/layers.py emits this layout directly.

    fwd_impl:
      - "auto":   XLA forward below _PALLAS_FWD_MIN_SEQ tokens (where its
                  fusion is at flops peak), Pallas forward above.
      - "xla":    force the hybrid (XLA fwd + Pallas fused bwd).
      - "pallas": force the Pallas forward kernel.
    Either way the backward is the fused Pallas kernel up to _BWD_MAX_SEQ.
    """
    B, S, threeD = flat.shape
    H = num_heads
    assert threeD % (3 * H) == 0, (flat.shape, H)
    D = threeD // 3
    hd = D // H
    scale = float(hd ** -0.5 if scale is None else scale)
    if fwd_impl == "auto":
        fwd_impl = "xla" if S < _PALLAS_FWD_MIN_SEQ else "pallas"
    if not _supported(S, D):
        out = _xla_attention_qkv(flat, scale, H)  # jax recompute VJP
    elif S > _BWD_MAX_SEQ:
        out = (_flash_fwd_only(flat, scale, H) if fwd_impl == "pallas"
               else _xla_attention_qkv(flat, scale, H))
    elif fwd_impl == "pallas":
        out = _flash(flat, scale, H)              # fused Pallas fwd + bwd
    else:
        out = _hybrid(flat, scale, H)             # XLA fwd + Pallas bwd
    return out


def flash_attention_qkv(qkv, *, scale=None, fwd_impl: str = "auto"):
    """Attention over a packed (B, S, 3, H, hd) qkv tensor -> (B, S, H, hd).

    Compat wrapper over `flash_attention_qkv_flat`; the 5D->flat reshape is
    a relayout on TPU (see the flat entry's docstring) — hot paths should
    project flat and call the flat entry directly.
    """
    B, S, three, H, hd = qkv.shape
    assert three == 3, f"expected packed qkv with axis-2 == 3, got {qkv.shape}"
    out = flash_attention_qkv_flat(qkv.reshape(B, S, 3 * H * hd), H,
                                   scale=scale, fwd_impl=fwd_impl)
    return out.reshape(B, S, H, hd)


def flash_attention(q, k, v, *, scale=None, fwd_impl: str = "auto"):
    """Attention over separate (B, S, H, D) q/k/v tensors (compat wrapper:
    packs into the qkv layout, then runs the same kernels)."""
    return flash_attention_qkv(jnp.stack([q, k, v], axis=2), scale=scale,
                               fwd_impl=fwd_impl)
