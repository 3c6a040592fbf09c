"""Fused AdamW + master-weight + EMA update in one bandwidth-bound sweep.

The reference runs `opt.step()` then a separate Python EMA lerp
(`/root/reference/train.py:206-207,40-51`). This module fuses the whole
update — Adam moments, master weights, weight decay, EMA, bf16 param cast —
into one elementwise pass (`_update_math`). Math follows optax.adamw with
mu stored in `mu_dtype` (bias-corrected estimates computed in fp32):

    m <- b1 m + (1-b1) g           (stored in mu_dtype)
    v <- b2 v + (1-b2) g^2         (fp32)
    mhat = m / (1 - b1^t);  vhat = v / (1 - b2^t)
    master <- master - lr (mhat / (sqrt(vhat) + eps) + wd master)
    ema    <- d ema + (1-d) master
    param  <- master.astype(param.dtype)

Measured at XL/2 scale (675M params) on a v5e with RTT-corrected per-step
sync (benchmarks/optimizer_bench.py, docs/ABLATIONS.md): the optax chain
(adamw + masterize + update_ema) and this hand-fused sweep BOTH execute in
~37 ms against a ~24 ms bandwidth floor — XLA already fuses the optax
tree_map chain into a near-single sweep, so this path is performance-
neutral, kept as a tested option and as the substrate for flat-state
layouts. Two lowerings:

- default (XLA): `_update_math` under one tree.map; works with any
  sharding (plain jnp — GSPMD partitions it like everything else).
- `use_pallas=True`: a Pallas kernel over (rows, 128) tiles. Loses on
  real param trees: reshaping a (…, 16, 72)-shaped leaf to (rows, 128) is
  a physical TPU layout change, so XLA inserts copies that break the
  in-place aliasing (OOM at 675M) and add traffic.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["FusedAdamWEmaState", "FactoredNu", "fused_adamw_ema_init",
           "fused_adamw_ema_apply"]

_LANE = 128
_ROWS = 1024  # tile rows: 1024x128 elements per grid step per buffer


class FusedAdamWEmaState(NamedTuple):
    count: jnp.ndarray  # int32 step counter (optax semantics)
    mu: Any             # first moment, mu_dtype
    nu: Any             # second moment: fp32 / nu_dtype arrays, or FactoredNu
    master: Any         # fp32 master weights


class FactoredNu(NamedTuple):
    """Adafactor-style factored second moment for one >=2D leaf: running
    means of g^2 over the last axis (`row`) and second-to-last axis (`col`);
    the dense estimate is reconstructed as
        v_ij ~= row_i * col_j / mean_i(row)
    (Shazeer & Stern, arXiv:1804.04235 eq. 4 with mean normalization).
    Cuts XL/2's 2.7 GB fp32 nu to ~3 MB — the memory lever that lets
    `--remat-policy attn` fit at accum 1 in 16 GB."""
    row: jnp.ndarray  # (..., R) fp32
    col: jnp.ndarray  # (..., C) fp32


# factor only where the saving is real; tiny/1D leaves keep dense nu
_FACTOR_MIN_SIZE = 1 << 16


def _factorable(p) -> bool:
    return (p.ndim >= 2 and p.shape[-1] > 1 and p.shape[-2] > 1
            and p.size >= _FACTOR_MIN_SIZE)


def fused_adamw_ema_init(params, mu_dtype=jnp.bfloat16,
                         nu_dtype=jnp.float32,
                         factored: bool = False) -> FusedAdamWEmaState:
    """`nu_dtype`/`factored` shrink the second-moment state (bf16 nu: half;
    factored: ~zero). CAVEAT bf16 nu: with b2=0.999 the per-step relative
    update (~1e-3) is below bf16 resolution (~4e-3), so a warm nu only moves
    when g^2 jumps by >~4x — cheap, but a materially coarser adaptive scale.
    `factored` keeps fp32 precision in a rank-1 structure instead and is the
    recommended memory lever (it is what TPU LLM training uses at scale)."""
    master = jax.tree.map(lambda p: p.astype(jnp.float32), params)

    def nu_for(p):
        if factored and _factorable(p):
            return FactoredNu(row=jnp.zeros(p.shape[:-1], jnp.float32),
                              col=jnp.zeros(p.shape[:-2] + p.shape[-1:],
                                            jnp.float32))
        return jnp.zeros(p.shape, nu_dtype)

    return FusedAdamWEmaState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(lambda p: jnp.zeros(p.shape, mu_dtype), params),
        nu=jax.tree.map(nu_for, params),
        master=master,
    )


def _update_math(g, m, v, w, e, bc1, bc2, *, lr, b1, b2, eps, wd, ema_decay,
                 mu_dtype, p_dtype):
    """The shared elementwise update (used by both the kernel and the XLA
    fallback so the two paths cannot drift). nu math runs in fp32 and is
    stored back in v.dtype (fp32 default; bf16 under nu_dtype)."""
    g32 = g.astype(jnp.float32)
    m_new = (b1 * m.astype(jnp.float32) + (1.0 - b1) * g32).astype(mu_dtype)
    v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
    v_new = v32.astype(v.dtype)
    mhat = m_new.astype(jnp.float32) * bc1
    vhat = v32 * bc2
    w_new = w - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * w)
    e_new = ema_decay * e + (1.0 - ema_decay) * w_new
    return w_new.astype(p_dtype), m_new, v_new, w_new, e_new


def _update_math_factored(g, m, v: FactoredNu, w, e, bc1, bc2, *, lr, b1, b2,
                          eps, wd, ema_decay, mu_dtype, p_dtype):
    """The factored-nu variant: identical m/master/EMA math, but the
    adaptive scale comes from the rank-1 reconstruction of running row/col
    means of g^2 (see FactoredNu)."""
    g32 = g.astype(jnp.float32)
    m_new = (b1 * m.astype(jnp.float32) + (1.0 - b1) * g32).astype(mu_dtype)
    g2 = g32 * g32
    row = b2 * v.row + (1.0 - b2) * g2.mean(axis=-1)
    col = b2 * v.col + (1.0 - b2) * g2.mean(axis=-2)
    norm = jnp.maximum(row.mean(axis=-1, keepdims=True), 1e-30)
    vhat = (row / norm)[..., :, None] * col[..., None, :] * bc2
    mhat = m_new.astype(jnp.float32) * bc1
    w_new = w - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * w)
    e_new = ema_decay * e + (1.0 - ema_decay) * w_new
    return (w_new.astype(p_dtype), m_new, FactoredNu(row=row, col=col),
            w_new, e_new)


def _leaf_kernel(bc_ref, g_ref, m_ref, v_ref, w_ref, e_ref,
                 p_out, m_out, v_out, w_out, e_out, **kw):
    p, m, v, w, e = _update_math(
        g_ref[...], m_ref[...], v_ref[...], w_ref[...], e_ref[...],
        bc_ref[0], bc_ref[1], **kw)
    p_out[...] = p
    m_out[...] = m
    v_out[...] = v
    w_out[...] = w
    e_out[...] = e


def _fused_leaf(g, m, v, w, e, bc, p_dtype, hyper):
    n = g.size
    rows = n // _LANE
    shape2 = (rows, _LANE)
    g2, m2, v2, w2, e2 = (a.reshape(shape2) for a in (g, m, v, w, e))
    r = min(_ROWS, rows)
    grid = (pl.cdiv(rows, r),)
    spec = lambda dt: pl.BlockSpec((r, _LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        functools.partial(_leaf_kernel, mu_dtype=m.dtype, p_dtype=p_dtype,
                          **hyper),
        out_shape=(
            jax.ShapeDtypeStruct(shape2, p_dtype),
            jax.ShapeDtypeStruct(shape2, m.dtype),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.float32),
        ),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [spec(None)] * 5,
        out_specs=(spec(None),) * 5,
        # m/v/master/ema update in place (buffers are donated by the step)
        input_output_aliases={2: 1, 3: 2, 4: 3, 5: 4},
        cost_estimate=pl.CostEstimate(
            flops=12 * n, transcendentals=n,
            bytes_accessed=2 * n * (p_dtype.itemsize + m.dtype.itemsize
                                    + 3 * 4)),
        interpret=interpret,
    )(bc, g2, m2, v2, w2, e2)
    return tuple(o.reshape(g.shape) for o in outs)


def fused_adamw_ema_apply(state: FusedAdamWEmaState, grads, params, ema, *,
                          lr: float, b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8, weight_decay: float = 0.0,
                          ema_decay: float = 0.9999, use_pallas: bool = False):
    """One fused optimizer+EMA step. Returns (params, state, ema).

    `use_pallas` routes lane-aligned leaves through the Pallas kernel; the
    default lets XLA fuse `_update_math` (measured faster on real param
    trees — see module docstring)."""
    if use_pallas:
        # the kernel declares fp32 outputs aliased onto nu/master/ema inputs;
        # a non-fp32 leaf would fail at lowering with an opaque aliasing
        # error (the XLA path would instead silently promote) — check early
        # (nu is checked per-leaf in `one` — bf16/factored nu leaves simply
        # take the XLA path)
        for name, tree in (("master", state.master), ("ema", ema)):
            bad = [l.dtype for l in jax.tree.leaves(tree)
                   if l.dtype != jnp.float32]
            if bad:
                raise TypeError(
                    f"fused_adamw_ema_apply(use_pallas=True) needs fp32 "
                    f"{name} leaves, got {bad[0]}")
    count = state.count + 1
    t = count.astype(jnp.float32)
    # bias corrections are scalars: computed once, prefetched to SMEM
    bc = jnp.stack([1.0 / (1.0 - b1 ** t), 1.0 / (1.0 - b2 ** t)])
    hyper = dict(lr=lr, b1=b1, b2=b2, eps=eps, wd=weight_decay,
                 ema_decay=ema_decay)

    def one(g, p, m, v, w, e):
        if isinstance(v, FactoredNu):
            return _update_math_factored(g, m, v, w, e, bc[0], bc[1],
                                         mu_dtype=m.dtype, p_dtype=p.dtype,
                                         **hyper)
        if (use_pallas and v.dtype == jnp.float32
                and g.size % _LANE == 0 and g.size >= _LANE * 8):
            return _fused_leaf(g, m, v, w, e, bc, p.dtype, hyper)
        out = _update_math(g, m, v, w, e, bc[0], bc[1], mu_dtype=m.dtype,
                           p_dtype=p.dtype, **hyper)
        return out

    # nu may hold FactoredNu nodes, which tree.map would descend into —
    # flatten it treating them as leaves (same structure as grads then)
    g_leaves, treedef = jax.tree.flatten(grads)
    is_fnu = lambda n: isinstance(n, FactoredNu)
    nu_leaves = jax.tree.flatten(state.nu, is_leaf=is_fnu)[0]
    flat = [one(g, p, m, v, w, e) for g, p, m, v, w, e in zip(
        g_leaves, jax.tree.leaves(params), jax.tree.leaves(state.mu),
        nu_leaves, jax.tree.leaves(state.master), jax.tree.leaves(ema))]
    unzip = lambda i: jax.tree.unflatten(treedef, [o[i] for o in flat])
    new_params = unzip(0)
    new_state = FusedAdamWEmaState(count=count, mu=unzip(1), nu=unzip(2),
                                   master=unzip(3))
    return new_params, new_state, unzip(4)
