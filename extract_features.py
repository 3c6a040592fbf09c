"""Extract SD-VAE latent features from an ImageNet folder — dataset prep CLI.

Flag-compatible with the reference (`/root/reference/extract_features.py:179-196`)
and behavior-matched to its pipeline (:110-177): ADM center crop + random
hflip + Normalize(0.5, 0.5), `vae.encode(x).latent_dist.sample() * 0.18215`,
per-sample `.npy` feature (1, 4, h, w) + label pairs under
`{features_path}/imagenet{size}_features` / `_labels`.

TPU-first: images are batched (the reference encodes one at a time), the
encode+sample+scale is one jitted program, and files are named by GLOBAL
dataset index — fixing the reference's multi-rank filename collision
(extract_features.py:171-176, SURVEY.md §3.3 caveat). The hflip draw is
seeded per-sample so re-runs are reproducible.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.utils.platform import (
    maybe_enable_compilation_cache, maybe_force_cpu,
    maybe_initialize_distributed)
from fast_dit_tpu.ckpt.vae_import import import_vae_checkpoint
from fast_dit_tpu.data import ImageFolderIndex, load_image
from fast_dit_tpu.models.vae import AutoencoderKL, DiagonalGaussian, VAE_SCALE


def main(args):
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    maybe_initialize_distributed()
    rank = jax.process_index()
    world = jax.process_count()
    seed = args.global_seed * world + rank
    print(f"Starting rank={rank}, seed={seed}, world_size={world}.")

    feat_dir = os.path.join(args.features_path, f"imagenet{args.image_size}_features")
    label_dir = os.path.join(args.features_path, f"imagenet{args.image_size}_labels")
    if rank == 0:
        os.makedirs(feat_dir, exist_ok=True)
        os.makedirs(label_dir, exist_ok=True)

    assert args.image_size % 8 == 0, "Image size must be divisible by 8 (for the VAE encoder)."
    vae_path = (args.vae_ckpt or os.environ.get("SD_VAE_PATH")
                or f"pretrained_models/sd-vae-ft-{args.vae}")
    vae = AutoencoderKL()
    if not os.path.exists(vae_path):
        raise FileNotFoundError(
            f"SD-VAE weights not found at {vae_path}; pass --vae-ckpt or set "
            "SD_VAE_PATH to a local diffusers-format checkpoint "
            "(no network egress in this environment).")
    vae_params = import_vae_checkpoint(vae_path, vae)

    dataset = ImageFolderIndex(args.data_path)
    print(f"Dataset contains {len(dataset):,} images ({args.data_path})")

    @jax.jit
    def encode(x, rng):
        moments = vae.apply(vae_params, x, method=vae.encode_moments)
        dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
        z = jnp.transpose(dist.sample(rng), (0, 3, 1, 2))
        return z * VAE_SCALE

    B = args.batch_size
    rng = jax.random.PRNGKey(seed)
    my_indices = list(range(rank, len(dataset), world))  # global-index stride
    for s in range(0, len(my_indices), B):
        chunk = my_indices[s: s + B]
        imgs, labels = [], []
        for gi in chunk:
            path, label = dataset[gi]
            img_rng = np.random.default_rng(args.global_seed * 1_000_003 + gi)
            imgs.append(load_image(path, args.image_size, hflip=True, rng=img_rng))
            labels.append(label)
        x = jnp.asarray(np.stack(imgs))
        z = np.asarray(encode(x, jax.random.fold_in(rng, s)))
        for j, gi in enumerate(chunk):
            np.save(f"{feat_dir}/{gi}.npy", z[j: j + 1])          # (1, 4, h, w)
            np.save(f"{label_dir}/{gi}.npy", np.array([labels[j]]))
        if rank == 0 and (s // B) % args.log_every == 0:
            print(f"[rank 0] encoded {s + len(chunk)}/{len(my_indices)}")
    print(f"rank {rank} done.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    # reference-compatible flags (extract_features.py:179-196)
    parser.add_argument("--data-path", type=str, required=True)
    parser.add_argument("--features-path", type=str, default="features")
    parser.add_argument("--results-dir", type=str, default="results")
    parser.add_argument("--model", type=str, default="DiT-XL/2")
    parser.add_argument("--image-size", type=int, choices=[256, 512], default=256)
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--epochs", type=int, default=1400)
    parser.add_argument("--global-batch-size", type=int, default=256)
    parser.add_argument("--global-seed", type=int, default=0)
    parser.add_argument("--vae", type=str, choices=["ema", "mse"], default="ema")
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("--ckpt-every", type=int, default=50_000)
    # TPU-native extensions
    parser.add_argument("--vae-ckpt", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=32,
                        help="per-process VAE encode batch (reference used 1)")
    main(parser.parse_args())
