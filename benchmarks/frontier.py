"""Quality-speed frontier for fast sampling: {ddpm250, ddim100, ddim50} x
{FORA cache interval 1..4}, one JSON line per config with throughput AND
latent drift — the honest decision surface behind the cached-sampling
headline numbers (docs/ABLATIONS.md).

Drift is reported two ways (both share the same x_T and noise stream):
  - `rel_l2_vs_own_exact`: vs the SAME sampler at interval 1 — isolates the
    cache approximation (0 at k=1 by construction);
  - `rel_l2_vs_ddpm250`: vs the reference-default exact sampler
    (`/root/reference/sample.py:77-78`: 250 DDPM steps) — total deviation
    from the reference configuration, including the sampler/step-count
    change itself.

Without pretrained weights the drift numbers are mechanism-level
(perturbed-random weights, like benchmarks/cache_error.py); pass --ckpt when
real weights exist. Throughput numbers are weight-independent.
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


def rel_l2(a, b):
    d = a.astype("float64") - b.astype("float64")
    return float((d ** 2).sum() ** 0.5 / ((b.astype("float64") ** 2).sum() ** 0.5))


def main():
    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--cfg-scale", type=float, default=1.5)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--attn-backend", default="auto")
    ap.add_argument("--samplers", default="ddpm:250,ddim:100,ddim:50",
                    help="comma list of sampler:steps")
    ap.add_argument("--intervals", default="1,2,3,4")
    ap.add_argument("--tome-mlp", action="store_true",
                    help="token-merge the MLP branch too in the tome rows")
    ap.add_argument("--tome-ratios", default="",
                    help="comma list of token-merging ratios to run as extra "
                         "ddpm250 rows (alone and composed with cache k=2), "
                         "e.g. '0.5,0.75'")
    ap.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                    metavar=("SIGMA_LO", "SIGMA_HI"),
                    help="also run each config composed with the guidance "
                         "interval (arXiv:2404.07724): CFG only inside the "
                         "sigma band, half-batch conditional steps outside "
                         "(diffusion/guidance_interval.py) — e.g. 0.19 1.61")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models

    latent = args.image_size // 8
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = DiT_models[args.model](input_size=latent, dtype=dtype,
                                   attn_backend=args.attn_backend)
    if args.ckpt:
        from fast_dit_tpu.ckpt import find_model, state_dict_to_flax
        params = {"params": jax.tree.map(jnp.asarray, state_dict_to_flax(
            find_model(args.ckpt), model.depth, model.num_heads))}
        weights = os.path.basename(args.ckpt)
    else:
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 4, latent, latent)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        # perturb so zero-init gates don't make the cache trivially exact
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
                      for p, k in zip(leaves, keys)])
        weights = "perturbed-random (mechanism-level drift)"

    n = args.batch
    y = jnp.concatenate([jnp.arange(n) % 1000, jnp.full((n,), 1000)])
    rng = jax.random.PRNGKey(42)
    z = jax.random.normal(jax.random.fold_in(rng, 0), (2 * n, 4, latent, latent))

    def run_config(sampler, steps, interval, tome_ratio=0.0,
                   cfg_interval=None, spacing="uniform"):
        if spacing == "karras":
            diffusion = create_diffusion(f"karras{steps}")
        else:
            diffusion = create_diffusion(
                f"ddim{steps}" if sampler == "ddim" else str(steps))
        mdl = (model.clone(tome_ratio=tome_ratio, tome_mlp=args.tome_mlp)
               if tome_ratio else model)

        # params/z enter as jit ARGUMENTS — capturing them as constants
        # ships gigabytes through the remote compile service per config
        def fn(p, zz):
            apply = lambda x, t, **kw: mdl.apply(
                p, x, t, y, method=mdl.forward_with_cfg,
                cfg_scale=args.cfg_scale, **kw)
            cond_apply = lambda x, t, **kw: mdl.apply(p, x, t, y[:n], **kw)
            if cfg_interval is not None and interval == 1:
                # guidance interval (arXiv:2404.07724): CFG only inside the
                # sigma band, half-batch conditional forwards outside —
                # same wiring as sample.py
                from fast_dit_tpu.diffusion import guidance_interval_fn
                lo, hi = cfg_interval
                apply = guidance_interval_fn(
                    apply, cond_apply, diffusion.schedule, lo, hi)
            if sampler == "dpm":
                return diffusion.dpm_solver_sample_loop(
                    apply, zz.shape, noise=zz, clip_denoised=False)[:n]
            if sampler == "unipc":
                return diffusion.unipc_sample_loop(
                    apply, zz.shape, noise=zz, clip_denoised=False)[:n]
            if interval == 1:
                loop = (diffusion.p_sample_loop if sampler == "ddpm"
                        else diffusion.ddim_sample_loop)
                return loop(apply, zz.shape, noise=zz, rng=rng,
                            clip_denoised=False)[:n]
            forced = None
            if cfg_interval is not None:
                from fast_dit_tpu.diffusion import guidance_interval_cached_fns
                lo, hi = cfg_interval
                full_fn, cached_fn, forced = guidance_interval_cached_fns(
                    apply, cond_apply, diffusion.schedule, lo, hi)
            else:
                full_fn = lambda x, t: apply(x, t, want_cache=True)
                cached_fn = lambda x, t, cache: apply(x, t, cache=cache)
            loop = (diffusion.p_sample_loop_cached if sampler == "ddpm"
                    else diffusion.ddim_sample_loop_cached)
            return loop(
                full_fn, cached_fn,
                zz.shape, interval=interval, force_refresh_mask=forced,
                noise=zz, rng=rng, clip_denoised=False)[:n]

        fn = jax.jit(fn)
        out = jax.device_get(fn(params, z))  # compile + materialize
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(fn(params, z).sum())
            times.append(time.perf_counter() - t0)
        times.sort()
        return np.asarray(out), times[len(times) // 2]

    print(json.dumps({"weights": weights, "model": args.model,
                      "image_size": args.image_size, "batch": n,
                      "cfg": args.cfg_scale, "dtype": args.dtype}))
    # sampler spec: "name:steps[:karras]" (karras = Karras sigma spacing
    # of the retained timesteps, respace.karras_timesteps)
    configs = []
    for s in args.samplers.split(","):
        parts = s.split(":")
        configs.append((parts[0], int(parts[1]),
                        parts[2] if len(parts) > 2 else "uniform"))
    intervals = [int(s) for s in args.intervals.split(",")]

    ref250 = None
    own_exact = {}
    for sampler, steps, spacing in configs:
        for k in intervals:
            if sampler in ("dpm", "unipc") and k > 1:
                continue  # dpm/unipc ARE the honest fast path; no cache
                # composition
            variants = [None]
            if args.cfg_interval is not None:
                variants.append(tuple(args.cfg_interval))
            for ci in variants:
                out, p50 = run_config(sampler, steps, k, cfg_interval=ci,
                                      spacing=spacing)
                if k == 1 and ci is None:
                    own_exact[(sampler, steps, spacing)] = out
                    if ref250 is None and sampler == "ddpm" and steps == 250:
                        ref250 = out
                row = {
                    "sampler": sampler, "steps": steps, "cache_interval": k,
                    "img_per_sec": round(n / p50, 4),
                    "p50_latency_sec": round(p50, 3),
                    "rel_l2_vs_own_exact": round(
                        rel_l2(out, own_exact[(sampler, steps, spacing)]), 5),
                }
                if spacing != "uniform":
                    row["time_spacing"] = spacing
                if ci is not None:
                    row["cfg_interval"] = list(ci)
                if ref250 is not None:
                    row["rel_l2_vs_ddpm250"] = round(rel_l2(out, ref250), 5)
                print(json.dumps(row), flush=True)

    # token-merging rows: ddpm250 at each ratio, alone and with cache k=2
    ratios = [float(r) for r in args.tome_ratios.split(",") if r]
    for ratio in ratios:
        for k in (1, 2):
            out, p50 = run_config("ddpm", 250, k, tome_ratio=ratio)
            row = {
                "sampler": "ddpm", "steps": 250, "cache_interval": k,
                "tome_ratio": ratio, "tome_mlp": args.tome_mlp,
                "img_per_sec": round(n / p50, 4),
                "p50_latency_sec": round(p50, 3),
            }
            if ref250 is not None:
                row["rel_l2_vs_ddpm250"] = round(rel_l2(out, ref250), 5)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
