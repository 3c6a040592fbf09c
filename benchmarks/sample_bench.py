"""Sampling throughput benchmark: images/sec/chip and p50 latency for
DiT-XL/2 256x256 at 250 DDPM steps with CFG — the BASELINE.json north-star.

Measures the full fused program (CFG doubled-batch DiT + 250-step scan);
VAE decode is excluded by default (weights are offline) but included with
--vae-ckpt. Prints one JSON line per configuration.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8, help="images per batch (pre-CFG)")
    ap.add_argument("--num-sampling-steps", type=int, default=250)
    ap.add_argument("--cfg-scale", type=float, default=1.5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--attn-backend", default="auto")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                    metavar=("SIGMA_LO", "SIGMA_HI"),
                    help="guidance interval (arXiv:2404.07724): CFG only "
                         "inside the sigma band, conditional-only (half "
                         "compute) elsewhere")
    ap.add_argument("--cache-interval", type=int, default=1,
                    help="FORA layer caching (1 = off/exact)")
    ap.add_argument("--cache-schedule", default="uniform",
                    choices=["uniform", "logsnr", "abar"],
                    help="nonuniform cache-refresh placement (same budget)")
    ap.add_argument("--tome-ratio", type=float, default=0.0,
                    help="token merging fraction (0 = off/exact)")
    ap.add_argument("--tome-mlp", action="store_true",
                    help="token-merge the MLP branch too")
    ap.add_argument("--quantize", default=None, choices=[None, "w8a8"],
                    help="int8 block projections (2x MXU peak; approximate)")
    ap.add_argument("--sampler", default="ddpm",
                    choices=["ddpm", "ddim", "dpm", "unipc", "euler", "heun"],
                    help="dpm = DPM-Solver++(2M), unipc = UniPC "
                         "predictor-corrector: pair with small "
                         "--num-sampling-steps (10-25); euler/heun = flow "
                         "ODE samplers (diffusion/flow.py, learn_sigma=False "
                         "velocity model; heun is 2 NFE/step)")
    ap.add_argument("--time-spacing", default="uniform",
                    choices=["uniform", "karras"],
                    help="karras = retained timesteps at Karras sigma "
                         "positions (few-step accuracy win)")
    args = ap.parse_args()

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models

    latent = args.image_size // 8
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    is_flow = args.sampler in ("euler", "heun")
    model = DiT_models[args.model](input_size=latent, dtype=dtype,
                                   attn_backend=args.attn_backend,
                                   quant=args.quantize,
                                   # flow model predicts a 4-channel velocity
                                   learn_sigma=not is_flow,
                                   tome_ratio=args.tome_ratio,
                                   tome_mlp=args.tome_mlp)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 4, latent, latent)),
                        jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    if is_flow:
        assert args.cache_interval <= 1 and args.cfg_interval is None and \
            args.time_spacing == "uniform", (
                "cache / sigma band / karras spacing are discrete-chain "
                "machinery; the flow ODE grid has none")
    diffusion = create_diffusion(
        f"karras{args.num_sampling_steps}" if args.time_spacing == "karras"
        else str(args.num_sampling_steps))
    n = args.batch
    use_cfg = args.cfg_scale > 1.0
    y = jnp.concatenate([jnp.arange(n) % 1000, jnp.full((n,), 1000)]) if use_cfg \
        else jnp.arange(n) % 1000

    @jax.jit
    def run(params, rng):
        z = jax.random.normal(rng, (n, 4, latent, latent))
        if use_cfg:
            z = jnp.concatenate([z, z], 0)
            cfg_apply = lambda x, t, **kw: model.apply(
                params, x, t, y, method=model.forward_with_cfg,
                cfg_scale=args.cfg_scale,
                # flow CFG guides the full 4-channel velocity; eps models
                # keep the reference 3-channel quirk (models_original.py:262)
                guidance_channels=4 if is_flow else 3, **kw)
            cond_apply = lambda x, t, **kw: model.apply(params, x, t, y[:n],
                                                        **kw)
            apply = cfg_apply
            if args.cfg_interval is not None and args.cache_interval <= 1:
                from fast_dit_tpu.diffusion import guidance_interval_fn

                apply = guidance_interval_fn(
                    cfg_apply, cond_apply, diffusion.schedule,
                    *args.cfg_interval)
        else:
            apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
        if args.cache_interval > 1:
            assert args.sampler == "ddpm"
            forced = None
            if args.cfg_interval is not None:
                assert use_cfg
                from fast_dit_tpu.diffusion import guidance_interval_cached_fns

                full_fn, cached_fn, forced = guidance_interval_cached_fns(
                    cfg_apply, cond_apply, diffusion.schedule,
                    *args.cfg_interval)
            else:
                full_fn = lambda x, t: apply(x, t, want_cache=True)
                cached_fn = lambda x, t, cache: apply(x, t, cache=cache)
            out = diffusion.p_sample_loop_cached(
                full_fn, cached_fn,
                z.shape, interval=args.cache_interval,
                refresh_schedule=args.cache_schedule,
                force_refresh_mask=forced, noise=z, rng=rng,
                clip_denoised=False)
        elif is_flow:
            from fast_dit_tpu.diffusion import flow_sample_loop

            out = flow_sample_loop(apply, z.shape,
                                   num_steps=args.num_sampling_steps,
                                   method=args.sampler, noise=z)
        elif args.sampler == "dpm":
            out = diffusion.dpm_solver_sample_loop(apply, z.shape, noise=z,
                                                   clip_denoised=False)
        elif args.sampler == "unipc":
            out = diffusion.unipc_sample_loop(apply, z.shape, noise=z,
                                              clip_denoised=False)
        elif args.sampler == "ddim":
            out = diffusion.ddim_sample_loop(apply, z.shape, noise=z, rng=rng,
                                             clip_denoised=False)
        else:
            out = diffusion.p_sample_loop(apply, z.shape, noise=z, rng=rng,
                                          clip_denoised=False)
        return out[:n]

    float(run(params, jax.random.PRNGKey(0)).sum())  # compile + materialize
    times = []
    for i in range(args.reps):
        t0 = time.perf_counter()
        float(run(params, jax.random.PRNGKey(i)).sum())  # host-synced
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": f"sampling images/sec/chip, {args.model} "
                  f"{args.image_size}x{args.image_size}, "
                  f"{args.num_sampling_steps} {args.sampler.upper()} steps, "
                  f"cfg {args.cfg_scale}, "
                  + (f"cfg-interval {args.cfg_interval[0]}-"
                     f"{args.cfg_interval[1]}, "
                     if args.cfg_interval is not None else "")
                  + f"{args.dtype}, batch {n}"
                  + (f", cache {args.cache_interval}"
                       f"{'' if args.cache_schedule == 'uniform' else ' ' + args.cache_schedule}"
                     if args.cache_interval > 1 else "")
                  + (f", int8 {args.quantize}" if args.quantize else "")
                  + (f", tome {args.tome_ratio}"
                       f"{'+mlp' if args.tome_mlp else ''}"
                     if args.tome_ratio > 0 else ""),
        "value": round(n / p50, 4),
        "unit": "images/sec/chip",
        "p50_latency_sec": round(p50, 3),
    }))


if __name__ == "__main__":
    main()
