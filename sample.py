"""Sample new images from a trained DiT — single-device sampler CLI.

Flag-compatible with the reference (`/root/reference/sample.py:71-83`) and
behavior-matched to its flow (:21-68): fixed seed, registry model, EMA-
preferring checkpoint load, `create_diffusion(str(steps))`, CFG doubled batch
([z;z], [y;1000]), `p_sample_loop(forward_with_cfg, clip_denoised=False)`,
keep the first half, VAE-decode /0.18215, save a 2x4 grid to sample.png.

TPU-first: the model forward, CFG combine, all 250 steps, AND the VAE decode
compile into one jitted program. Extensions for offline use: `--ckpt random`
(random init), `--vae-ckpt` local diffusers weights; without VAE weights the
latents are saved to sample.npy instead.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.utils.platform import (
    maybe_enable_compilation_cache, maybe_force_cpu,
    maybe_initialize_distributed)
from fast_dit_tpu.ckpt import find_model, state_dict_to_flax
from fast_dit_tpu.ckpt.vae_import import import_vae_checkpoint
from fast_dit_tpu.diffusion import create_diffusion
from fast_dit_tpu.models import DiT_models
from fast_dit_tpu.models.vae import AutoencoderKL, VAE_SCALE
from fast_dit_tpu.utils.image import save_image


def load_dit_params(args, model):
    if args.ckpt == "random":
        params = model.init({"params": jax.random.PRNGKey(args.seed)},
                            jnp.zeros((1, 4, model.input_size, model.input_size)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        # zero-init head would produce all-zero outputs; perturb for demo runs
        # (one key per leaf so same-shaped leaves get independent noise)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
        return jax.tree_util.tree_unflatten(
            treedef,
            [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)])
    if args.ckpt and os.path.isdir(args.ckpt):
        # orbax checkpoint dir from train.py: load the EMA weights
        # (same preference as the reference's find_model, download.py:26-29)
        from fast_dit_tpu.ckpt import restore_checkpoint

        restored = restore_checkpoint(args.ckpt)
        tree = restored["ema"] if "ema" in restored else restored["params"]
        return jax.tree.map(jnp.asarray, tree)
    ckpt_path = args.ckpt or f"DiT-XL-2-{args.image_size}x{args.image_size}.pt"
    sd = find_model(ckpt_path)
    return jax.tree.map(jnp.asarray,
                        state_dict_to_flax(sd, model.depth, model.num_heads))


def maybe_load_vae(args):
    path = args.vae_ckpt or os.environ.get("SD_VAE_PATH") or f"pretrained_models/sd-vae-ft-{args.vae}"
    if os.path.exists(path):
        vae = AutoencoderKL()
        return vae, import_vae_checkpoint(path, vae)
    return None, None


def main(args):
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    maybe_initialize_distributed()
    latent_size = args.image_size // 8
    is_flow = args.sampler in ("euler", "heun")
    if is_flow:
        assert args.cache_interval <= 1 and args.cfg_interval is None, (
            "--sampler euler/heun integrate the flow ODE "
            "(diffusion/flow.py); the layer cache and the DDPM sigma band "
            "are discrete-chain features")
    model = DiT_models[args.model](input_size=latent_size,
                                   num_classes=args.num_classes,
                                   # flow checkpoints predict velocity: no
                                   # learned-sigma channel doubling
                                   learn_sigma=not is_flow,
                                   attn_backend=args.attn_backend,
                                   quant=args.quantize,
                                   tome_ratio=args.tome_ratio,
                                   tome_mlp=args.tome_mlp,
                                   dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    params = load_dit_params(args, model)
    diffusion = create_diffusion(
        f"karras{args.num_sampling_steps}" if args.time_spacing == "karras"
        else str(args.num_sampling_steps))
    vae, vae_params = maybe_load_vae(args)

    # labels from the reference demo (sample.py:47)
    class_labels = [207, 360, 387, 974, 88, 979, 417, 279]
    n = len(class_labels)
    use_cfg = args.cfg_scale > 1.0
    # only double the batch under CFG; at cfg<=1 (the FID-parity config)
    # sample n latents directly instead of computing a discarded half
    y = (jnp.array(class_labels + [1000] * n) if use_cfg
         else jnp.array(class_labels))

    @jax.jit
    def run(params, vae_params, rng):
        z = jax.random.normal(jax.random.fold_in(rng, 0),
                              (n, 4, latent_size, latent_size))
        if use_cfg:
            z = jnp.concatenate([z, z], axis=0)
            cfg_apply = lambda x, t, **kw: model.apply(
                params, x, t, y, method=model.forward_with_cfg,
                cfg_scale=args.cfg_scale,
                # flow CFG guides the full velocity; the 3-channel quirk is
                # an eps-parameterization artifact (models/dit.py)
                **({"guidance_channels": model.in_channels} if is_flow else {}),
                **kw)
            cond_apply = lambda x, t, **kw: model.apply(params, x, t, y[:n], **kw)
            apply = cfg_apply
            if args.cfg_interval is not None and args.cache_interval <= 1:
                # guidance interval (arXiv:2404.07724): CFG only where the
                # noise level sigma(t) is in [lo, hi]; elsewhere only the
                # conditional half runs (half the model FLOPs per step)
                from fast_dit_tpu.diffusion import guidance_interval_fn

                lo, hi = args.cfg_interval
                apply = guidance_interval_fn(
                    cfg_apply, cond_apply, diffusion.schedule, lo, hi)
        else:
            apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
        if args.cache_interval > 1:
            # FORA-style layer cache: full model every k-th step, cached
            # adaLN-gate-only steps in between (diffusion/sampling.py)
            assert args.sampler not in ("dpm", "unipc"), (
                "--cache-interval composes with ddpm/ddim; dpm/unipc are "
                "already the honest-compute fast path (use fewer steps "
                "instead)")
            forced = None
            if args.cfg_interval is not None:
                assert use_cfg, "--cfg-interval requires cfg-scale > 1"
                # composed guidance interval x layer cache: half-batch
                # conditional steps outside the sigma band, full-batch CFG
                # inside, one 2B cache with a forced band-entry refresh
                from fast_dit_tpu.diffusion import guidance_interval_cached_fns

                lo, hi = args.cfg_interval
                full_fn, cached_fn, forced = guidance_interval_cached_fns(
                    cfg_apply, cond_apply, diffusion.schedule, lo, hi)
            else:
                full_fn = lambda x, t: apply(x, t, want_cache=True)
                cached_fn = lambda x, t, cache: apply(x, t, cache=cache)
            loop = (diffusion.p_sample_loop_cached if args.sampler == "ddpm"
                    else diffusion.ddim_sample_loop_cached)
            samples = loop(
                full_fn, cached_fn,
                z.shape, interval=args.cache_interval,
                refresh_schedule=args.cache_schedule,
                force_refresh_mask=forced, noise=z,
                rng=jax.random.fold_in(rng, 1), clip_denoised=False)
        elif is_flow:
            # probability-flow ODE for a flow-matching checkpoint
            # (--objective flow in train.py); heun = 2nd order, 2 NFE/step
            from fast_dit_tpu.diffusion import flow_sample_loop

            samples = flow_sample_loop(
                apply, z.shape, num_steps=args.num_sampling_steps,
                method=args.sampler, noise=z)
        elif args.sampler == "dpm":
            # DPM-Solver++(2M): deterministic 2nd-order multistep — pair
            # with a small --num-sampling-steps (10-25)
            samples = diffusion.dpm_solver_sample_loop(
                apply, z.shape, noise=z, clip_denoised=False)
        elif args.sampler == "unipc":
            # UniPC: DPM++(2M)'s budget + a reused-evaluation corrector —
            # the strongest honest-compute choice at <= 10 steps
            samples = diffusion.unipc_sample_loop(
                apply, z.shape, noise=z, clip_denoised=False)
        else:
            loop = (diffusion.p_sample_loop if args.sampler == "ddpm"
                    else diffusion.ddim_sample_loop)
            samples = loop(
                apply, z.shape, noise=z, rng=jax.random.fold_in(rng, 1),
                clip_denoised=False)
        samples = samples[:n]  # keep the conditional half (reference :64)
        if vae_params is not None:
            return vae.apply(vae_params, samples / VAE_SCALE, method=vae.decode)
        return samples

    rng = jax.random.PRNGKey(args.seed)
    out = np.asarray(run(params, vae_params, rng))
    if vae_params is not None:
        save_image(out, "sample.png", nrow=4, value_range=(-1, 1))
        print("Saved sample.png")
    else:
        np.save("sample.npy", out)
        save_image(out[:, :3], "sample.png", nrow=4,
                   value_range=(float(out.min()), float(out.max())))
        print("No VAE weights found (set --vae-ckpt or SD_VAE_PATH); "
              "saved raw latents to sample.npy and a latent preview to sample.png")


def parse_args():
    parser = argparse.ArgumentParser()
    # reference-compatible flags (sample.py:71-83)
    parser.add_argument("--model", type=str, choices=list(DiT_models.keys()),
                        default="DiT-XL/2")
    parser.add_argument("--vae", type=str, choices=["ema", "mse"], default="mse")
    parser.add_argument("--image-size", type=int, choices=[256, 512], default=256)
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--cfg-scale", type=float, default=4.0)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="DiT checkpoint path; 'random' for random init; "
                             "default auto-downloads the pretrained model")
    # TPU-native extensions
    parser.add_argument("--vae-ckpt", type=str, default=None,
                        help="local diffusers-format SD-VAE weights")
    parser.add_argument("--attn-backend", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "einsum"])
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations for faster sampling")
    parser.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                        metavar=("SIGMA_LO", "SIGMA_HI"),
                        help="apply CFG only where the EDM noise level "
                             "sigma(t)=sqrt((1-abar)/abar) is inside "
                             "[LO, HI] (guidance interval, arXiv:2404.07724)"
                             " — improves FID AND halves model compute on "
                             "the out-of-band steps; the paper's ImageNet "
                             "band is 0.19 1.61 (~30%% of steps guided)")
    parser.add_argument("--cache-interval", type=int, default=1,
                        help="FORA layer caching: run the full model every "
                             "k-th step, reuse per-layer attention/MLP "
                             "outputs in between (1 = off/exact; 2-3 trades "
                             "a little fidelity for ~1.5-2.5x speed)")
    parser.add_argument("--cache-schedule", type=str, default="uniform",
                        choices=["uniform", "logsnr", "abar"],
                        help="placement of the cache refreshes: same budget "
                             "as --cache-interval, nonuniform spacing by "
                             "log-SNR or alpha-bar (diffusion/sampling.py "
                             "cache_refresh_mask)")
    parser.add_argument("--tome-ratio", type=float, default=0.0,
                        help="token merging (ops/tome.py): fraction of "
                             "tokens merged inside every block's "
                             "attention/MLP (0 = off/exact; 0.5 is a good "
                             "speed-quality point, max 0.75; approximate "
                             "like --cache-interval and composes with it)")
    parser.add_argument("--tome-mlp", action="store_true",
                        help="token-merge the MLP branch too (~2x the "
                             "saving, ~8x the drift -- see ABLATIONS)")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["w8a8"],
                        help="int8 W8A8 block projections (2x MXU peak on "
                             "v5e+; a precision trade like bf16 -- see "
                             "docs/ABLATIONS.md)")
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=["ddpm", "ddim", "dpm", "unipc",
                                 "euler", "heun"],
                        help="ddim pairs naturally with --num-sampling-steps "
                             "via the ddimN respacing; dpm = DPM-Solver++"
                             "(2M), a 2nd-order deterministic solver for "
                             "small step counts (10-25); unipc = UniPC "
                             "(same budget, reused-evaluation corrector, "
                             "strongest at <= 10 steps); euler/heun "
                             "integrate the flow ODE — only for checkpoints "
                             "trained with --objective flow")
    parser.add_argument("--time-spacing", type=str, default="uniform",
                        choices=["uniform", "karras"],
                        help="placement of the retained timesteps: karras "
                             "spaces them at Karras sigma positions "
                             "(arXiv:2206.00364) — a large accuracy win for "
                             "dpm/unipc at <= 10 steps (see ABLATIONS)")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
