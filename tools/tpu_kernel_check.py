"""Compiled-mode (real TPU) validation of the Pallas attention kernels at
their dispatch boundary shapes, against a HOST-SIDE numpy float64 oracle.

The pytest suite exercises the kernels in interpret mode on CPU
(tests/test_flash_attention.py); this tool runs the SAME numerics compiled
on the actual chip, at every regime of the dispatch ladder in
ops/flash_attention.py:

  S=256   fused Pallas fwd+bwd AND the hybrid XLA-fwd path — flagship 256²
  S=512   fused Pallas fwd+bwd — the _PALLAS_FWD_MIN_SEQ crossover
  S=1024  fused Pallas fwd+bwd — the _BWD_MAX_SEQ boundary (512², patch 2)
  S=2048  Pallas fwd + XLA-recompute bwd — the _MAX_SEQ boundary
  S=4096  XLA fallback (shape unsupported by the kernels) — must still be
          correct end to end

The oracle is softmax attention + its manual VJP in numpy float64 on the
host — a TPU-side oracle would itself run bf16 MXU passes at default matmul
precision (~5e-4 error at these shapes), masking what is being measured.
Tolerances are therefore per (dtype, path):

  fp32 Pallas (exact row-max softmax, HIGHEST-precision passes): 2e-5
  fp32 through XLA default precision (hybrid fwd / 4096 fallback): 5e-3
  bf16 anywhere (storage rounding alone is 4e-3): 5e-2

Run: python tools/tpu_kernel_check.py  (needs the TPU; ~10 min of compiles)
Committed evidence: performance/v5e/tpu_kernel_check.jsonl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


CASES = [
    (256, "hybrid+pallas"),
    (512, "pallas"),
    (1024, "pallas"),
    (2048, "pallas-fwd-only"),
    (4096, "xla-fallback"),
]


def oracle_fp64(qkv, g):
    """Attention fwd + input grads in numpy float64. qkv: (B, S, 3, H, hd)."""
    qkv = np.asarray(qkv, np.float64)
    g = np.asarray(g, np.float64)
    B, S, _, H, hd = qkv.shape
    scale = hd ** -0.5
    out = np.empty((B, S, H, hd))
    dqkv = np.empty_like(qkv)
    for b in range(B):
        for h in range(H):
            q, k, v = (qkv[b, :, i, h] for i in range(3))
            go = g[b, :, h]
            s = (q @ k.T) * scale
            s -= s.max(axis=-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=-1, keepdims=True)
            out[b, :, h] = p @ v
            dv = p.T @ go
            dp = go @ v.T
            delta = (p * dp).sum(axis=-1, keepdims=True)
            ds = p * (dp - delta) * scale
            dqkv[b, :, 0, h] = ds @ k
            dqkv[b, :, 1, h] = ds.T @ q
            dqkv[b, :, 2, h] = dv
    return out, dqkv


def tolerance(dtype_name, fwd_impl, S):
    """Per-path tolerances mirroring flash_attention_qkv's dispatch ladder.

    fp32 Pallas kernels run the exact row-max softmax with HIGHEST-precision
    MXU passes (-> 2e-5 vs fp64); any fp32 XLA leg runs default matmul
    precision, i.e. bf16 passes (-> 5e-3).
    """
    if dtype_name == "bfloat16":
        return 5e-2, 5e-2
    from fast_dit_tpu.ops.flash_attention import (
        _BWD_MAX_SEQ, _MAX_SEQ, _PALLAS_FWD_MIN_SEQ)

    if S > _MAX_SEQ:                       # XLA fallback end to end
        return 5e-3, 5e-3
    pallas_fwd = (fwd_impl == "pallas"
                  or (fwd_impl == "auto" and S >= _PALLAS_FWD_MIN_SEQ))
    fwd_tol = 2e-5 if pallas_fwd else 5e-3
    # the fused Pallas backward runs for every impl up to _BWD_MAX_SEQ;
    # above it the backward is an XLA recompute
    bwd_tol = 2e-5 if S <= _BWD_MAX_SEQ else 5e-3
    return fwd_tol, bwd_tol


def check(S, dtype_name, fwd_impl):
    from fast_dit_tpu.ops.flash_attention import flash_attention_qkv

    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    B, H, hd = (2 if S <= 1024 else 1), 16, 72
    key = jax.random.PRNGKey(S)
    qkv = (jax.random.normal(key, (B, S, 3, H, hd)) * 0.5).astype(dtype)
    g = jax.random.normal(jax.random.fold_in(key, 1),
                          (B, S, H, hd)).astype(dtype)

    def loss(x):
        return (flash_attention_qkv(x, fwd_impl=fwd_impl)
                * g.astype(jnp.float32)).sum()

    out = jax.jit(lambda x: flash_attention_qkv(x, fwd_impl=fwd_impl))(qkv)
    dqkv = jax.jit(jax.grad(loss))(qkv)
    ref_out, ref_dqkv = oracle_fp64(qkv, g)

    f_err = float(np.abs(np.asarray(out, np.float64) - ref_out).max())
    g_err = float(np.abs(np.asarray(dqkv, np.float64) - ref_dqkv).max())
    f_tol, g_tol = tolerance(dtype_name, fwd_impl, S)
    return {"S": S, "dtype": dtype_name, "fwd_impl": fwd_impl,
            "fwd_max_abs_err": round(f_err, 7), "fwd_tol": f_tol,
            "grad_max_abs_err": round(g_err, 7), "grad_tol": g_tol,
            "fwd_ok": f_err <= f_tol, "grad_ok": g_err <= g_tol}


# ring-attention shard-local hop (ops/ring_attention.py): the multi-chip
# ring itself is CPU-mesh-tested (tests/test_sequence.py); what needs the
# real chip is the hop kernel's compiled numerics at the 512²/1024² shard
# sizes the sequence-parallel path exists for. With logits < the clamp the
# normalized hop output equals exact softmax attention, so the SAME fp64
# oracle applies. fp32 at 4096 exceeds the backward's VMEM budget (and is
# never dispatched — the Pallas hop is the bf16 path); bf16 covers it.
RING_CASES = [(1024, "float32"), (1024, "bfloat16"),
              (2048, "bfloat16"), (4096, "bfloat16")]


def check_ring_hop(S, dtype_name):
    from fast_dit_tpu.ops.ring_attention import _ring_hop

    dtype = jnp.float32 if dtype_name == "float32" else jnp.bfloat16
    B, H, hd = 1, 16, 72
    D = H * hd
    key = jax.random.PRNGKey(S + 7)
    qf, kf, vf = ((jax.random.normal(k, (B, S, D)) * 0.5).astype(dtype)
                  for k in jax.random.split(key, 3))
    g = jax.random.normal(jax.random.fold_in(key, 1), (B, S, H, hd))
    scale = hd ** -0.5

    def out_fn(qf, kf, vf):
        o, l = _ring_hop(qf, kf, vf, scale, H)
        return o.reshape(B, S, H, hd) / jnp.maximum(l, 1e-30)[..., None]

    def loss(qf, kf, vf):
        return (out_fn(qf, kf, vf) * g).sum()

    out = jax.jit(out_fn)(qf, kf, vf)
    dq, dk, dv = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(qf, kf, vf)
    qkv = jnp.stack([qf.reshape(B, S, H, hd), kf.reshape(B, S, H, hd),
                     vf.reshape(B, S, H, hd)], axis=2)
    ref_out, ref_dqkv = oracle_fp64(qkv, g)
    f_err = float(np.abs(np.asarray(out, np.float64) - ref_out).max())
    g_err = max(float(np.abs(np.asarray(d, np.float64).reshape(B, S, H, hd)
                             - ref_dqkv[:, :, i]).max())
                for i, d in enumerate((dq, dk, dv)))
    f_tol, g_tol = (5e-2, 5e-2) if dtype_name == "bfloat16" else (5e-5, 5e-5)
    return {"S": S, "dtype": dtype_name, "fwd_impl": "ring-hop",
            "fwd_max_abs_err": round(f_err, 7), "fwd_tol": f_tol,
            "grad_max_abs_err": round(g_err, 7), "grad_tol": g_tol,
            "fwd_ok": f_err <= f_tol, "grad_ok": g_err <= g_tol}


def main():
    if jax.default_backend() != "tpu":
        print(json.dumps({"error": "needs a real TPU backend "
                          f"(got {jax.default_backend()})"}))
        sys.exit(2)
    failures = 0
    results = []
    for S, regime in CASES:
        impls = ["pallas", "xla"] if S == 256 else ["auto"]
        for impl in impls:
            for dtype_name in ("float32", "bfloat16"):
                row = check(S, dtype_name, impl)
                row["regime"] = regime
                results.append(row)
                print(json.dumps(row), flush=True)
                if not (row["fwd_ok"] and row["grad_ok"]):
                    failures += 1
    for S, dtype_name in RING_CASES:
        row = check_ring_hop(S, dtype_name)
        row["regime"] = "ring-hop"
        results.append(row)
        print(json.dumps(row), flush=True)
        if not (row["fwd_ok"] and row["grad_ok"]):
            failures += 1
    print(json.dumps({"cases": len(results), "failures": failures,
                      "device": str(jax.devices()[0])}), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
