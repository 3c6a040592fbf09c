"""Approximation error of the FORA layer cache (--cache-interval k).

Samples the same latents (identical noise stream) with the exact sampler
and with the cached sampler at several intervals, and reports the latent
deviation. Without pretrained weights this cannot measure FID; it measures
the *mechanical* drift the cache introduces on a random-init (or loaded)
model — the quantity that is zero at k=1 and grows with k.

Prints one JSON line per interval:
  {"interval": k, "rel_l2": ..., "psnr_db": ..., "max_abs": ...}

rel_l2 = ||x_cached - x_exact|| / ||x_exact|| over the final latents;
psnr_db uses the exact sampler's dynamic range.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--num-sampling-steps", type=int, default=250)
    ap.add_argument("--cfg-scale", type=float, default=1.5)
    ap.add_argument("--intervals", default="2,3,4")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--ckpt", default=None, help="optional .pt / orbax weights")
    args = ap.parse_args()

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models

    latent = args.image_size // 8
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = DiT_models[args.model](input_size=latent, dtype=dtype)
    if args.ckpt:
        from fast_dit_tpu.ckpt import find_model, state_dict_to_flax
        sd = find_model(args.ckpt)
        params = {"params": jax.tree.map(
            jnp.asarray, state_dict_to_flax(sd, model.depth, model.num_heads))}
    else:
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 4, latent, latent)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1,), jnp.int32))
        # fresh init has ZERO adaLN gates and head -> every block is the
        # identity and the cache is trivially exact; perturb (as sample.py's
        # --ckpt random does) so the blocks actually contribute
        params = jax.tree.map(
            lambda p: p + 0.02 * jax.random.normal(jax.random.PRNGKey(1),
                                                   p.shape, p.dtype), params)
    diffusion = create_diffusion(str(args.num_sampling_steps))
    n = args.batch
    y = jnp.concatenate([jnp.arange(n) % 1000, jnp.full((n,), 1000)])
    rng = jax.random.PRNGKey(42)
    z = jax.random.normal(jax.random.fold_in(rng, 0), (2 * n, 4, latent, latent))

    apply = lambda x, t, **kw: model.apply(
        params, x, t, y, method=model.forward_with_cfg,
        cfg_scale=args.cfg_scale, **kw)

    @jax.jit
    def exact():
        return diffusion.p_sample_loop(apply, z.shape, noise=z, rng=rng,
                                       clip_denoised=False)[:n]

    def cached(k):
        @jax.jit
        def run():
            return diffusion.p_sample_loop_cached(
                lambda x, t: apply(x, t, want_cache=True),
                lambda x, t, cache: apply(x, t, cache=cache),
                z.shape, interval=k, noise=z, rng=rng,
                clip_denoised=False)[:n]
        return run()

    ref = jax.device_get(exact()).astype("float64")
    rng_range = float(ref.max() - ref.min())
    for k in [int(s) for s in args.intervals.split(",")]:
        got = jax.device_get(cached(k)).astype("float64")
        err = got - ref
        rel_l2 = float((err ** 2).sum() ** 0.5 / (ref ** 2).sum() ** 0.5)
        mse = float((err ** 2).mean())
        psnr = float("inf") if mse == 0 else 20 * jnp.log10(rng_range) - 10 * jnp.log10(mse)
        print(json.dumps({"interval": k, "rel_l2": round(rel_l2, 5),
                          "psnr_db": round(float(psnr), 2),
                          "max_abs": round(float(abs(err).max()), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
