"""Benchmark: DiT-XL/2 training steps/sec at global batch 128 on one chip.

Apples-to-apples with the reference's headline training number: 0.84
steps/sec on 1xA100-80GB with its full fast path (gradient checkpointing +
AMP + pre-extracted VAE features, `/root/reference/README.md:108-113`). Our
equivalent: remat'd blocks + bf16 activations + synthetic latent features,
one jitted train step with donated state.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 0.84  # 1xA100, reference README.md:113


def run(model_name: str, batch: int, accum: int, steps: int, image_size: int,
        attn_backend: str, remat_policy: str = "nothing",
        fused_optimizer: bool = False, scan_unroll: int = 1,
        factored_nu: bool = False):
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.train import create_train_state, make_train_step

    latent = image_size // 8
    model = DiT_models[model_name](
        input_size=latent, dtype=jnp.bfloat16, remat=True,
        remat_policy=remat_policy, attn_backend=attn_backend,
        scan_unroll=scan_unroll)
    schedule = create_diffusion("").schedule
    # bf16 params + fp32 master weights + bf16 Adam first moment: the config
    # that fits XL/2 Adam training in 16 GB HBM (the reference's AMP fast
    # path equivalent; fp32-Adam-state XL/2 needs ~17.2 GB)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   mixed_precision=True,
                                   mu_dtype=jnp.bfloat16,
                                   fused_optimizer=fused_optimizer,
                                   factored_nu=factored_nu)
    step = jax.jit(
        make_train_step(model, schedule, tx, grad_accum=accum),
        donate_argnums=(0,),
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (batch, 4, latent, latent))
    y = jax.random.randint(jax.random.PRNGKey(2), (batch,), 0, 1000)
    batch_data = {"x": x, "y": y}

    # warmup / compile
    state, metrics = step(state, batch_data, jax.random.PRNGKey(3))
    float(metrics["loss"])
    state, metrics = step(state, batch_data, jax.random.PRNGKey(3))
    float(metrics["loss"])

    # host-sync every step: conservative wall-clock timing that a deferred/
    # async runtime cannot flatter
    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, batch_data, jax.random.PRNGKey(3))
        loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    return steps / dt, loss


def main():
    from fast_dit_tpu.utils.platform import (
        maybe_enable_compilation_cache, maybe_force_cpu)
    maybe_force_cpu()  # FDT_FORCE_CPU=1 for CI (env vars alone are ignored
    # under the axon sitecustomize, see CLAUDE.md)
    maybe_enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--global-batch-size", type=int, default=128)
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--accum", type=int, default=0, help="0 = auto")
    ap.add_argument("--accum-plan", default="1,2,4",
                    help="accumulation levels tried on OOM (fresh process each)")
    ap.add_argument("--attn-backend", default="auto")
    ap.add_argument("--remat-policy", default="nothing",
                    choices=["nothing", "attn", "attn_mlp"])
    ap.add_argument("--scan-unroll", type=int, default=1,
                    help="lax.scan unroll factor over the 28-block stack")
    ap.add_argument("--fused-optimizer", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="single-sweep fused AdamW+EMA update (measured "
                         "performance-neutral vs the optax chain once timing "
                         "is tunnel-RTT-corrected; see docs/ABLATIONS.md)")
    ap.add_argument("--factored-nu", action=argparse.BooleanOptionalAction,
                    default=False,
                    help="Adafactor-style rank-1 second moment (requires "
                         "--fused-optimizer): frees ~2.7GB of nu HBM on XL/2 "
                         "— the lever that fits --remat-policy attn at accum 1")
    ap.add_argument("--quick", action="store_true",
                    help="small model / batch smoke run")
    ap.add_argument("--metric", default="train", choices=["train", "sampling"],
                    help="'sampling' delegates to benchmarks/sample_bench.py")
    args = ap.parse_args()

    if args.metric == "sampling":
        import runpy

        sys.argv = ["sample_bench.py", "--model", args.model,
                    "--image-size", str(args.image_size),
                    "--attn-backend", args.attn_backend]
        runpy.run_path("benchmarks/sample_bench.py", run_name="__main__")
        return

    if args.quick:
        args.model, args.global_batch_size, args.steps = "DiT-S/2", 16, 3

    accum_plan = ([args.accum] if args.accum
                  else [int(a) for a in args.accum_plan.split(",")])
    accum, rest = accum_plan[0], accum_plan[1:]
    try:
        sps, loss = run(args.model, args.global_batch_size, accum,
                        args.steps, args.image_size, args.attn_backend,
                        args.remat_policy, args.fused_optimizer,
                        args.scan_unroll, args.factored_nu)
    except Exception as e:  # OOM -> retry with gradient accumulation
        msg = str(e)
        if args.accum or not rest or not any(
                s in msg for s in ("RESOURCE_EXHAUSTED", "Out of memory",
                                   "Ran out of memory", "hbm capacity")):
            raise
        # a failed attempt's buffers linger on this runtime even after
        # gc (and the raised traceback pins them) — re-exec a FRESH
        # process for the next accumulation level instead of retrying
        # in-process
        print(f"# accum={accum} OOM, re-exec with accum plan {rest}",
              file=sys.stderr, flush=True)
        import os
        argv = [sys.executable, os.path.abspath(__file__),
                "--model", args.model,
                "--global-batch-size", str(args.global_batch_size),
                "--image-size", str(args.image_size),
                "--steps", str(args.steps),
                "--attn-backend", args.attn_backend,
                "--remat-policy", args.remat_policy,
                "--scan-unroll", str(args.scan_unroll),
                "--accum-plan", ",".join(map(str, rest))]
        argv.append("--fused-optimizer" if args.fused_optimizer
                    else "--no-fused-optimizer")
        argv.append("--factored-nu" if args.factored_nu
                    else "--no-factored-nu")
        os.execv(sys.executable, argv)
    result = {
        "metric": f"train steps/sec, {args.model} {args.image_size}x{args.image_size}, "
                  f"global bs {args.global_batch_size}, 1 chip",
        "value": round(sps, 4),
        "unit": "steps/sec",
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
