"""On-chip evidence for the DiT-MoE family (models/moe.py).

The MoE family landed in round 4 as tested code with no v5e numbers; this
bench supplies them (the repo's per-feature evidence bar — every approx/
speed feature ships with a measured row, docs/ABLATIONS.md):

  --mode train   steps/sec for a DiT-MoE-* config vs its dense twin at the
                 standard train config (bf16 activations + remat + fp32
                 masters, same as bench.py), PLUS the router telemetry the
                 metrics already carry: load-balance loss, router z-loss and
                 the capacity-overflow drop rate at capacity_factor=1.25.
  --mode aot     compile-only memory probe of a config at a given batch —
                 answers "is the one-hot dispatch layout viable at XL/2
                 bs128 in 16 GB?" without burning a training run. Prints the
                 XLA memory analysis when the backend exposes it, or the
                 RESOURCE_EXHAUSTED breakdown when it doesn't fit.

One config per process (failed-attempt HBM is not reliably reclaimed
in-process on the axon backend — CLAUDE.md runtime landmines). Append rows:

    python benchmarks/moe_bench.py --model DiT-MoE-S/2-8E2A --mode train \
        --out performance/v5e/moe_bench.jsonl
    python benchmarks/moe_bench.py --model DiT-S/2 --mode train --out ...
    python benchmarks/moe_bench.py --model DiT-MoE-XL/2-8E2A --mode aot \
        --batch 128 --out ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(model_name, batch, image_size, accum):
    import jax
    import jax.numpy as jnp

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.train import create_train_state, make_train_step

    latent = image_size // 8
    model = DiT_models[model_name](input_size=latent, dtype=jnp.bfloat16,
                                   remat=True, attn_backend="auto")
    schedule = create_diffusion("").schedule
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   mixed_precision=True,
                                   mu_dtype=jnp.bfloat16)
    step = jax.jit(make_train_step(model, schedule, tx, grad_accum=accum),
                   donate_argnums=(0,))
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, latent, latent))
    y = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    return step, state, {"x": x, "y": y}, n_params


def mode_train(args):
    import jax

    step, state, batch_data, n_params = build(
        args.model, args.batch, args.image_size, args.accum)
    rng = jax.random.PRNGKey(3)
    state, metrics = step(state, batch_data, rng)   # compile
    float(metrics["loss"])
    state, metrics = step(state, batch_data, rng)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step(state, batch_data, rng)
        loss = float(metrics["loss"])               # host sync every step
    dt = time.perf_counter() - t0
    row = {
        "mode": "train", "model": args.model, "batch": args.batch,
        "image_size": args.image_size, "accum": args.accum,
        "params": n_params,
        "steps_per_sec": round(args.steps / dt, 4),
        "loss": round(loss, 4),
    }
    for k in ("moe_load_balance", "moe_router_z", "moe_dropped_frac"):
        if k in metrics:
            row[k] = round(float(metrics[k]), 5)
    return row


def mode_aot(args):
    import jax

    row = {"mode": "aot", "model": args.model, "batch": args.batch,
           "image_size": args.image_size, "accum": args.accum}
    try:
        step, state, batch_data, n_params = build(
            args.model, args.batch, args.image_size, args.accum)
        row["params"] = n_params
        lowered = step.lower(state, batch_data, jax.random.PRNGKey(3))
        compiled = lowered.compile()
        row["compiled"] = True
        try:
            ma = compiled.memory_analysis()
            row["memory_analysis"] = {
                k: int(getattr(ma, k))
                for k in ("argument_size_in_bytes", "output_size_in_bytes",
                          "temp_size_in_bytes", "generated_code_size_in_bytes")
                if hasattr(ma, k)}
        except Exception as e:  # axon backend may not expose it
            row["memory_analysis"] = f"unavailable: {e!r}"
    except Exception as e:
        # RESOURCE_EXHAUSTED messages carry the HBM breakdown (largest
        # buffers) — keep the head of the message as the evidence
        row["compiled"] = False
        row["error"] = str(e)[:2000]
    return row


def main():
    from fast_dit_tpu.utils.platform import (maybe_enable_compilation_cache,
                                             maybe_force_cpu)
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--mode", default="train", choices=["train", "aot"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default=None, help="jsonl to APPEND the row to")
    args = ap.parse_args()

    row = mode_train(args) if args.mode == "train" else mode_aot(args)
    import jax
    row["backend"] = jax.default_backend()
    print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
