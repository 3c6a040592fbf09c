"""On-chip runtime of ring attention's shard-local hop: Pallas kernel vs the
XLA streaming (online-softmax) formulation, at the shard sizes the
sequence-parallel path exists for (512²/1024² latents -> 1024/4096-token
shards, ops/ring_attention.py).

The multi-chip ring itself cannot run on this 1-chip env (correctness is
CPU-mesh-pinned in tests/test_sequence.py; numerics compiled on chip in
tools/tpu_kernel_check.py). What CAN be measured here is the per-hop block
compute both paths repeat n times per layer — the thing the round-3 trace
audit says decides the regime: the XLA hop materializes fp32 (B,H,Sq,Sk)
logits through HBM; the Pallas hop keeps them in VMEM.

Methodology per CLAUDE.md landmines: the ~33 ms tunnel RTT dwarfs a single
hop, so each timing jits ONE program that chains `--iters` dependent hops
(output feeds the next query) and is host-synced once; per-hop ms = total /
iters. Both paths chain identically.

Run: python benchmarks/ring_hop_bench.py          (TPU, few min of compiles)
Committed evidence: performance/v5e/ring_hop_bench.jsonl
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shard-sizes", default="1024,2048,4096")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--head-dim", type=int, default=72)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from fast_dit_tpu.ops.ring_attention import _ring_hop

    B, H, hd = args.batch, args.heads, args.head_dim
    D = H * hd
    scale = hd ** -0.5

    # grad mode remats each hop (as the production train step remats the
    # block stack): without it the XLA hop's saved (B,H,S,S) probabilities
    # alone exceed HBM over the chain (measured 25.5/15.75 GB at S=2048,
    # 50 hops) — which is the pathology the Pallas hop exists to avoid, but
    # benching needs the XLA side to fit at all
    def pallas_chain(q, k, v, remat=False):
        def body(c, _):
            o, _l = _ring_hop(c, k, v, scale, H)
            # feed the (rescaled) output back as the next query: a real data
            # dependence so XLA cannot batch or elide the chain
            return (o * (1.0 / k.shape[1])).astype(q.dtype), None

        out, _ = jax.lax.scan(jax.checkpoint(body) if remat else body,
                              q, None, length=args.iters)
        return out

    def xla_chain(q, k, v, remat=False):
        # one ring hop of the XLA streaming path (_ring_xla's step body on a
        # fresh carry): fp32 (B,H,Sq,Sk) logits + online-softmax update
        kf = k.astype(jnp.float32).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)
        vf = v.astype(jnp.float32).reshape(B, -1, H, hd).transpose(0, 2, 1, 3)

        def body(c, _):
            qf = (c.astype(jnp.float32) * scale).reshape(
                B, -1, H, hd).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", qf, kf)
            m = logits.max(axis=-1)
            p = jnp.exp(logits - m[..., None])
            l = p.sum(axis=-1)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, vf)
            o = (o * (1.0 / k.shape[1])).transpose(0, 2, 1, 3).reshape(
                B, -1, D)
            return o.astype(c.dtype), None

        out, _ = jax.lax.scan(jax.checkpoint(body) if remat else body,
                              q, None, length=args.iters)
        return out

    print(json.dumps({"device": str(jax.devices()[0]), "B": B, "H": H,
                      "hd": hd, "iters": args.iters}), flush=True)
    for S in [int(s) for s in args.shard_sizes.split(",")]:
        key = jax.random.PRNGKey(S)
        q, k, v = ((jax.random.normal(kk, (B, S, D)) * 0.5).astype(
            jnp.bfloat16) for kk in jax.random.split(key, 3))
        row = {"shard_tokens": S}
        for name, fn in (("pallas_hop", pallas_chain), ("xla_hop", xla_chain)):
            for mode in ("fwd", "grad"):
                if mode == "fwd":
                    jitted = jax.jit(
                        lambda q, k, v, f=fn: f(q, k, v).astype(
                            jnp.float32).sum())
                else:
                    # fwd+bwd of the whole chain: the training regime — the
                    # ring path is differentiable and sp-training is its
                    # second use case
                    jitted = jax.jit(jax.grad(
                        lambda q, k, v, f=fn: f(q, k, v, remat=True).astype(
                            jnp.float32).sum(), argnums=(0, 1, 2)))

                def sync():
                    out = jitted(q, k, v)
                    leaf = out[0] if isinstance(out, tuple) else out
                    float(jnp.asarray(leaf).astype(jnp.float32).sum())

                sync()  # compile + warm
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    sync()  # one host sync per rep
                    times.append(time.perf_counter() - t0)
                per_hop_ms = (1e3 * sorted(times)[len(times) // 2]
                              / args.iters)
                row[f"{name}_{mode}_ms"] = round(per_hop_ms, 4)
        for mode in ("fwd", "grad"):
            row[f"speedup_{mode}"] = round(
                row[f"xla_hop_{mode}_ms"] / row[f"pallas_hop_{mode}_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
