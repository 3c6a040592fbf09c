"""Large-scale parallel sampling for FID evaluation — the ADM-npz harness.

Flag- and output-compatible with the reference
(`/root/reference/sample_ddp.py:149-166` flags; :45-146 flow): per-process
seed = global_seed * world + rank, ceil-to-divisible total, CFG only when
cfg>1.0, uint8 quantize `clamp(127.5x + 128)`, rank-strided `{index:06d}.png`
filenames, final `{num}x H x W x 3` uint8 `.npz` (key `arr_0`) for the
OpenAI/ADM evaluation suite.

TPU-native: this is a pure-throughput workload (no inter-chip traffic,
SURVEY.md §3.4) — each host process generates its stride independently; the
jitted program fuses the 250-step sampler + CFG + VAE decode + uint8
quantization, and PNG encoding runs on a thread pool overlapped with device
compute (the reference serializes 50K PNG writes on the main thread).
"""

import argparse
import math
import os
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import tqdm

from fast_dit_tpu.utils.platform import (
    maybe_enable_compilation_cache, maybe_force_cpu,
    maybe_initialize_distributed)
from fast_dit_tpu.ckpt import find_model, state_dict_to_flax
from fast_dit_tpu.ckpt.vae_import import import_vae_checkpoint
from fast_dit_tpu.diffusion import create_diffusion
from fast_dit_tpu.models import DiT_models
from fast_dit_tpu.models.vae import AutoencoderKL, VAE_SCALE


def create_npz_from_sample_folder(sample_dir, num=50_000):
    """Pack `{i:06d}.png` images into the ADM-evaluator npz contract: a
    single uint8 array under the default key (`arr_0`), shape (num, H, W, 3)
    (reference sample_ddp.py:28-42; consumed by openai/guided-diffusion's
    evaluator per reference README.md:116-125)."""
    first = np.asarray(Image.open(f"{sample_dir}/000000.png"), np.uint8)
    stack = np.empty((num, *first.shape), np.uint8)
    stack[0] = first
    for i in tqdm(range(1, num), desc="Packing samples into npz"):
        stack[i] = np.asarray(Image.open(f"{sample_dir}/{i:06d}.png"), np.uint8)
    assert stack.ndim == 4 and stack.shape[-1] == 3, stack.shape
    npz_path = f"{sample_dir}.npz"
    np.savez(npz_path, arr_0=stack)
    print(f"Saved .npz file to {npz_path} [shape={stack.shape}].")
    return npz_path


def main(args):
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    maybe_initialize_distributed()
    rank = jax.process_index()
    world = jax.process_count()
    seed = args.global_seed * world + rank
    print(f"Starting rank={rank}, seed={seed}, world_size={world}.")

    if args.ckpt is None:
        assert args.model == "DiT-XL/2", "Only DiT-XL/2 models are available for auto-download."
        assert args.image_size in [256, 512]
        assert args.num_classes == 1000

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
    ckpt_path = args.ckpt or f"DiT-XL-2-{args.image_size}x{args.image_size}.pt"
    if ckpt_path == "random":
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 4, latent_size, latent_size)),
                            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    else:
        params = jax.tree.map(jnp.asarray, state_dict_to_flax(
            find_model(ckpt_path), model.depth, model.num_heads))
    diffusion = create_diffusion(
        f"karras{args.num_sampling_steps}" if args.time_spacing == "karras"
        else str(args.num_sampling_steps))

    vae_path = (args.vae_ckpt or os.environ.get("SD_VAE_PATH")
                or f"pretrained_models/sd-vae-ft-{args.vae}")
    vae = AutoencoderKL(block_out_channels=tuple(
        int(c) for c in args.vae_channels.split(",")))
    vae_params = import_vae_checkpoint(vae_path, vae) if os.path.exists(vae_path) else None
    if vae_params is None:
        print("WARNING: no SD-VAE weights found; saving latent-preview PNGs "
              "(set --vae-ckpt or SD_VAE_PATH for real images)")

    assert args.cfg_scale >= 1.0, "In almost all cases, cfg_scale be >= 1.0"
    using_cfg = args.cfg_scale > 1.0

    model_string_name = args.model.replace("/", "-")
    ckpt_string_name = os.path.basename(args.ckpt).replace(".pt", "") if args.ckpt else "pretrained"
    folder_name = (f"{model_string_name}-{ckpt_string_name}-size-{args.image_size}-"
                   f"vae-{args.vae}-cfg-{args.cfg_scale}-seed-{args.global_seed}")
    sample_folder_dir = f"{args.sample_dir}/{folder_name}"
    if rank == 0:
        os.makedirs(sample_folder_dir, exist_ok=True)
        print(f"Saving .png samples at {sample_folder_dir}")
    if world > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("mkdir")

    n = args.per_proc_batch_size
    global_batch_size = n * world
    total_samples = int(math.ceil(args.num_fid_samples / global_batch_size) * global_batch_size)
    if rank == 0:
        print(f"Total number of images that will be sampled: {total_samples}")
    samples_needed_this_proc = total_samples // world
    iterations = samples_needed_this_proc // n

    # within one process, shard the batch over all local chips (pure
    # throughput: no inter-chip traffic, like the reference's rank striding)
    n_local = len(jax.local_devices())
    mesh = None
    if n_local > 1 and n % n_local == 0:
        from fast_dit_tpu.parallel import create_mesh
        mesh = create_mesh(data=n_local, model=1, devices=jax.local_devices())
        print(f"Sharding generation over {n_local} local devices")

    def shard_batchwise(a):
        if mesh is None:
            return a
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = P("data", *([None] * (a.ndim - 1)))
        return jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))

    sampler_kind = args.sampler

    @jax.jit
    def generate(params, vae_params, rng):
        z = jax.random.normal(jax.random.fold_in(rng, 0),
                              (n, model.in_channels, latent_size, latent_size))
        z = shard_batchwise(z)
        y = jax.random.randint(jax.random.fold_in(rng, 1), (n,), 0, args.num_classes)
        y = shard_batchwise(y)
        if using_cfg:
            z = jnp.concatenate([z, z], 0)
            yy = jnp.concatenate([y, jnp.full((n,), 1000)], 0)
            cfg_apply = lambda x, t, **kw: model.apply(
                params, x, t, yy, method=model.forward_with_cfg,
                cfg_scale=args.cfg_scale,
                # flow CFG guides the full velocity (sample.py has the same)
                **({"guidance_channels": model.in_channels} if is_flow else {}),
                **kw)
            cond_apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
            apply = cfg_apply
            if args.cfg_interval is not None and args.cache_interval <= 1:
                # guidance interval (arXiv:2404.07724): CFG only inside the
                # sigma band, conditional-only (half compute) elsewhere
                from fast_dit_tpu.diffusion import guidance_interval_fn

                apply = guidance_interval_fn(
                    cfg_apply, cond_apply, diffusion.schedule,
                    *args.cfg_interval)
        else:
            apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
        if args.cache_interval > 1:
            assert sampler_kind not in ("dpm", "unipc"), (
                "--cache-interval composes with ddpm/ddim; dpm/unipc are "
                "already the honest-compute fast path (use fewer steps "
                "instead)")
            forced = None
            if args.cfg_interval is not None:
                assert using_cfg, "--cfg-interval requires cfg-scale > 1"
                # composed guidance interval x layer cache
                # (diffusion/guidance_interval.py)
                from fast_dit_tpu.diffusion import guidance_interval_cached_fns

                full_fn, cached_fn, forced = guidance_interval_cached_fns(
                    cfg_apply, cond_apply, diffusion.schedule,
                    *args.cfg_interval)
            else:
                full_fn = lambda x, t: apply(x, t, want_cache=True)
                cached_fn = lambda x, t, cache: apply(x, t, cache=cache)
            loop = (diffusion.p_sample_loop_cached if sampler_kind == "ddpm"
                    else diffusion.ddim_sample_loop_cached)
            samples = loop(
                full_fn, cached_fn,
                z.shape, interval=args.cache_interval,
                refresh_schedule=args.cache_schedule,
                force_refresh_mask=forced, noise=z,
                rng=jax.random.fold_in(rng, 2), clip_denoised=False)
        elif sampler_kind in ("euler", "heun"):
            # probability-flow ODE for a flow-matching checkpoint
            # (--objective flow in train.py)
            from fast_dit_tpu.diffusion import flow_sample_loop

            samples = flow_sample_loop(
                apply, z.shape, num_steps=args.num_sampling_steps,
                method=sampler_kind, noise=z)
        elif sampler_kind == "dpm":
            samples = diffusion.dpm_solver_sample_loop(
                apply, z.shape, noise=z, clip_denoised=False)
        elif sampler_kind == "unipc":
            samples = diffusion.unipc_sample_loop(
                apply, z.shape, noise=z, clip_denoised=False)
        else:
            loop = (diffusion.p_sample_loop if sampler_kind == "ddpm"
                    else diffusion.ddim_sample_loop)
            samples = loop(
                apply, z.shape, noise=z, rng=jax.random.fold_in(rng, 2),
                clip_denoised=False)
        samples = samples[:n]  # under CFG: remove the null-class half
        if vae_params is not None:
            samples = vae.apply(vae_params, samples / VAE_SCALE, method=vae.decode)
        else:
            samples = samples[:, :3]
        # uint8 quantization exactly as reference sample_ddp.py:132
        samples = jnp.clip(127.5 * samples + 128.0, 0, 255)
        return jnp.transpose(samples, (0, 2, 3, 1)).astype(jnp.uint8)

    rng = jax.random.PRNGKey(seed)
    pbar = tqdm(range(iterations)) if rank == 0 else range(iterations)
    total = 0
    with ThreadPoolExecutor(max_workers=args.io_threads) as pool:
        futures = []
        for it in pbar:
            samples = np.asarray(generate(params, vae_params,
                                          jax.random.fold_in(rng, it)))
            for i, sample in enumerate(samples):
                index = i * world + rank + total
                futures.append(pool.submit(
                    lambda s=sample, p=f"{sample_folder_dir}/{index:06d}.png":
                    Image.fromarray(s).save(p)))
            total += global_batch_size
        for f in futures:
            f.result()

    if world > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("samples_done")
    if rank == 0:
        create_npz_from_sample_folder(sample_folder_dir, args.num_fid_samples)
        print("Done.")


def build_parser():
    """The real CLI parser. Programmatic callers (tools/validate_pretrained.py)
    MUST build their Namespace via `build_parser().parse_args([...])` so new
    flags pick up their defaults automatically instead of drifting out of a
    hand-built Namespace (the round-3 failure mode)."""
    parser = argparse.ArgumentParser()
    # reference-compatible flags (sample_ddp.py:149-166)
    parser.add_argument("--model", type=str, choices=list(DiT_models.keys()),
                        default="DiT-XL/2")
    parser.add_argument("--vae", type=str, choices=["ema", "mse"], default="ema")
    parser.add_argument("--sample-dir", type=str, default="samples")
    parser.add_argument("--per-proc-batch-size", type=int, default=32)
    parser.add_argument("--num-fid-samples", type=int, default=50_000)
    parser.add_argument("--image-size", type=int, choices=[256, 512], default=256)
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--cfg-scale", type=float, default=1.5)
    parser.add_argument("--num-sampling-steps", type=int, default=250)
    parser.add_argument("--global-seed", type=int, default=0)
    parser.add_argument("--tf32", action=argparse.BooleanOptionalAction, default=True,
                        help="kept for flag parity; TPU numerics are controlled "
                             "by dtype/matmul-precision flags")
    parser.add_argument("--ckpt", type=str, default=None,
                        help="Optional DiT checkpoint path (default: auto-download "
                             "pretrained DiT-XL/2); 'random' for random init")
    # TPU-native extensions
    parser.add_argument("--vae-ckpt", type=str, default=None)
    parser.add_argument("--vae-channels", type=str, default="128,256,512,512",
                        help="AutoencoderKL block_out_channels (the SD "
                             "default); narrow configs support end-to-end "
                             "drills with synthetic VAE weights")
    parser.add_argument("--attn-backend", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "einsum"])
    parser.add_argument("--io-threads", type=int, default=16)
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations for faster sampling")
    parser.add_argument("--cfg-interval", type=float, nargs=2, default=None,
                        metavar=("SIGMA_LO", "SIGMA_HI"),
                        help="apply CFG only where sigma(t) is inside "
                             "[LO, HI] (guidance interval, arXiv:2404.07724)")
    parser.add_argument("--cache-interval", type=int, default=1,
                        help="FORA layer caching: full model every k-th "
                             "step (1 = off/exact; approximate for k > 1)")
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
                        help="dpm = DPM-Solver++(2M), deterministic "
                             "2nd-order; unipc = UniPC predictor-corrector "
                             "(same budget, strongest at <= 10 steps); "
                             "pair both with small step counts; euler/heun "
                             "integrate the flow ODE for checkpoints "
                             "trained with --objective flow")
    parser.add_argument("--time-spacing", type=str, default="uniform",
                        choices=["uniform", "karras"],
                        help="placement of the retained timesteps: karras "
                             "spaces them at Karras sigma positions "
                             "(arXiv:2206.00364) — a large accuracy win for "
                             "dpm/unipc at <= 10 steps")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
