"""hd=72 lane-padding experiment (VERDICT r4 item 7).

The round-3 train trace (performance/v5e/trace_train_bs128_pallas_r3b_flat.txt)
attributes the attention kernels' ~56% of lane ceiling to head_dim=72
padding to 128 lanes in both per-head matmuls of the forward:

    s = q (S, 72) @ k^T (72, S)     # contraction dim 72 -> 128 lanes
    o = p (S, S)  @ v (S, 72)       # output dim 72 -> 128 lanes

This bench measures concrete alternatives on identical inputs (the packed
flat (B, S, 3D) layout the production kernel consumes,
ops/flash_attention.py):

  prod        the production forward kernel (lane-sliced heads)
  transposed  an experimental kernel that moves hd to the SUBLANE dim
              (bf16 sublane tile = 16, so 72 pads to 80, not 128):
              in-VMEM per-head transposes of q/k/v, scores via a
              sublane-contraction dot, output as o^T = v^T @ p
              (lane contraction over S), one (hd, S) -> (S, hd) transpose
              to store. Measures whether the pad win survives the
              transpose + relayout cost.
  pad-proof   the production kernel at hd=128 (H=16, D=2048): 1.78x the
              FLOPs of hd=72. If the pad hypothesis is right its runtime
              is ~the hd=72 runtime (both sweep 128 lanes per pass); if
              hd=72 were flops-bound, hd=128 would be ~1.78x slower.

Methodology (CLAUDE.md landmines): one jitted program chains --iters
dependent calls (output feeds back into the qkv slot), host-synced once;
per-call ms = total/iters. Median of --reps.

Run on the chip:  python benchmarks/attn_layout_bench.py
Committed row:    performance/v5e/attn_layout_bench.jsonl
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CLAMP = 50.0


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _transposed_kernel(qkv_ref, o_ref, *, scale, num_heads, D):
    """Per-head sublane-contraction forward: hd lives on sublanes (pads
    72->80 at bf16) instead of lanes (72->128)."""
    S = qkv_ref.shape[0]
    hd = D // num_heads
    dtype = qkv_ref.dtype
    ones = jnp.ones((S, 128), dtype)
    for j in range(num_heads):
        qT = qkv_ref[:, j * hd:(j + 1) * hd].T               # (hd, S)
        kT = qkv_ref[:, D + j * hd: D + (j + 1) * hd].T      # (hd, S)
        vT = qkv_ref[:, 2 * D + j * hd: 2 * D + (j + 1) * hd].T
        # scores: contraction over the SUBLANE dim (hd)
        s = _dot(qT, kT, ((0,), (0,))) * scale               # (Sq, Sk) fp32
        p_u = jnp.exp(jnp.minimum(s, _CLAMP))
        denom = _dot(p_u.astype(dtype), ones, ((1,), (0,)))[:, :1]
        inv = 1.0 / jnp.maximum(denom, 1e-30)
        # o^T[d, r] = sum_s v^T[d, s] * p[r, s]: contraction over LANES (S)
        oT = _dot(vT, p_u.astype(dtype), ((1,), (1,)))       # (hd, Sq)
        o = (oT * inv[:, 0][None, :]).T                      # fold denom, store layout
        o_ref[:, j * hd:(j + 1) * hd] = o.astype(o_ref.dtype)


def transposed_forward(qkv, scale, num_heads):
    B, S, threeD = qkv.shape
    D = threeD // 3
    return pl.pallas_call(
        functools.partial(_transposed_kernel, scale=scale,
                          num_heads=num_heads, D=D),
        out_shape=jax.ShapeDtypeStruct((B, S, D), qkv.dtype),
        grid=(B,),
        in_specs=[pl.BlockSpec((None, S, threeD), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, S, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(qkv)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="batch rows per call (grid size); 16 amortizes "
                         "launch overhead while keeping compiles quick")
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=72)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from fast_dit_tpu.ops.flash_attention import _forward as prod_forward

    B, S, H, hd = args.batch, args.seq, args.heads, args.head_dim
    rows = []

    def bench(name, fn, D):
        scale = (D // H) ** -0.5
        qkv0 = (jax.random.normal(jax.random.PRNGKey(0), (B, S, 3 * D),
                                  jnp.float32) * 0.3).astype(jnp.bfloat16)

        @jax.jit
        def chain(qkv):
            def body(c, _):
                o = fn(c, scale, H)
                # feed the output back into all three q/k/v slots so every
                # iteration depends on the previous (no dead-code collapse)
                return jnp.concatenate([o, o, o], axis=-1), ()
            out, _ = jax.lax.scan(body, qkv, None, length=args.iters)
            return out

        float(chain(qkv0).sum())                      # compile + materialize
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(chain(qkv0).sum())
            times.append(time.perf_counter() - t0)
        ms = 1e3 * sorted(times)[len(times) // 2] / args.iters
        row = {"variant": name, "B": B, "S": S, "H": H, "hd": D // H,
               "ms_per_call": round(ms, 4),
               "us_per_head_layer": round(1e3 * ms / H, 2)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        return ms

    D72 = H * hd
    t_prod = bench("prod", prod_forward, D72)
    t_tr = bench("transposed", transposed_forward, D72)
    t_128 = bench("pad-proof-hd128", prod_forward, H * 128)

    concl = {
        "conclusion": {
            "transposed_vs_prod": round(t_prod / t_tr, 3),
            "hd128_vs_hd72_time": round(t_128 / t_prod, 3),
            "note": "transposed_vs_prod > 1 means the sublane layout wins; "
                    "hd128_vs_hd72_time ~ 1 confirms hd=72 is pad-bound "
                    "(1.78x flops for free), ~1.78 refutes it",
        }
    }
    rows.append(concl)
    print(json.dumps(concl), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
