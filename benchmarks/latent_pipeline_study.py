"""The REAL pipeline, end to end, offline: VAE latents -> latent DiT ->
decode -> judged quality.

The pixel-space study (`benchmarks/quality_study.py`) gives the
speed-quality ordering genuine trained-model evidence, but the product
pipeline the reference ships is LATENT diffusion: images -> SD-VAE encode
(`/root/reference/extract_features.py:168`) -> DiT on (4, H/8, W/8) latents
-> VAE decode (`sample.py:65`). No pretrained SD-VAE exists in this offline
environment — so this study trains the in-repo `AutoencoderKL`
(`fast_dit_tpu/models/vae.py`, a small `block_out_channels` config) on the
procedural dataset itself, then runs the full chain with every layer coming
from this repo:

  1. build a FINITE pixel dataset once (the host renderer is single-core
     and ~12 s per 256-image batch at 256² — per-step fresh batches would
     be a 20-hour train; a finite dataset trained for many epochs is also
     exactly the reference's contract: extract features once
     (`extract_features.py`), then epoch over the .npy set (`train.py`));
  2. train a small kl-f8 AutoencoderKL (recon MSE + beta*KL) on it; report
     recon PSNR + the empirical latent scale (the analog of the SD 0.18215,
     which is itself 1/std of the training latents);
  3. encode the dataset ONCE (posterior sample, scaled) — the study's
     `extract_features.py` step — and train DiT-S/2 on the cached latents:
     at --image-size 256 the DiT input is (4, 32, 32), EXACTLY the tensor
     contract of the reference's 256² feature pipeline;
  4. sample {exact, cache k, guidance band, composed, dpm} in latent space,
     decode with the same VAE, and judge with an independent pixel-space
     CNN (same judge design as quality_study; trained on a held-out slice
     of the dataset), multi-seed with error bars. The real-vs-real floor
     row uses freshly generated images (seeds disjoint from the dataset).

Everything is deterministic given the seeds. Output: one JSON line per
config (+ a VAE sanity row), optionally written to --jsonl.

Usage (one TPU chip). The axon tunnel client leaks host RAM roughly
linearly in bytes transferred host<->device; the full 256² chain moves
enough to get the single process OOM-killed at ~130 GB RSS (observed
2026-08-21), so production runs chain one phase per process:

    for ph in build vae judge dit eval; do
        python benchmarks/latent_pipeline_study.py --phase $ph \
            --out-dir /tmp/lstudy \
            --jsonl performance/v5e/latent_pipeline_256.jsonl
    done
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from benchmarks.quality_study import make_sampler


# ---------------------------------------------------------------------------
# finite pixel dataset (built once; the renderer is single-core host numpy)
# ---------------------------------------------------------------------------

def build_pixel_dataset(num, image_size, *, seed=0, gen_batch=256,
                        log_every=20):
    """(pixels uint8 (N, 3, H, W), labels (N,)) — rendered once, stored
    quantized (the reference's inputs are uint8 JPEGs too). Dataset seeds
    live in [6_000_000, 6_000_000 + num/gen_batch): disjoint from every
    stream in quality_study.py and from this study's eval splits."""
    from fast_dit_tpu.data.synthetic import NUM_CLASSES, synth_batch

    labels = np.arange(num, dtype=np.int64) % NUM_CLASSES
    labels = np.random.default_rng(
        np.random.SeedSequence([0x1A7E, seed])).permutation(labels)
    pixels = np.empty((num, 3, image_size, image_size), np.uint8)
    t0 = time.perf_counter()
    nb = (num + gen_batch - 1) // gen_batch
    for b in range(nb):
        lo, hi = b * gen_batch, min(num, (b + 1) * gen_batch)
        x = synth_batch(labels[lo:hi], seed=6_000_000 + b,
                        image_size=image_size)
        pixels[lo:hi] = np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)
        if log_every and ((b + 1) % log_every == 0 or b == nb - 1):
            print(f"[data] {hi}/{num} images "
                  f"({hi / (time.perf_counter() - t0):.0f} img/s)", flush=True)
    return pixels, labels


def _dequant(u8):
    return u8.astype(np.float32) / 127.5 - 1.0


# ---------------------------------------------------------------------------
# VAE training on the cached dataset
# ---------------------------------------------------------------------------

def train_vae(pixels, *, steps=1500, batch=16, lr=1e-4,
              kl_weight=1e-6, channels=(32, 64, 128, 128), seed=0,
              log_every=200, holdout=64):
    """Train the in-repo AutoencoderKL (small config) on the cached dataset
    (first `len(pixels) - holdout` images; the tail is the recon holdout).

    Returns (vae_module, params, metrics) with metrics holding held-out
    recon PSNR and the empirical latent scale 1/std (the SD-VAE's 0.18215 is
    exactly this statistic for LAION — reference extract_features.py:168)."""
    import jax
    import jax.numpy as jnp
    import optax
    from fast_dit_tpu.models.vae import AutoencoderKL, DiagonalGaussian

    image_size = pixels.shape[-1]
    n_train = len(pixels) - holdout
    vae = AutoencoderKL(block_out_channels=tuple(channels))
    params = vae.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 3, image_size, image_size)),
                      jax.random.PRNGKey(0))
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(p, x, rng):
        moments = vae.apply(p, x, method=vae.encode_moments)
        dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
        z = jnp.transpose(dist.sample(rng), (0, 3, 1, 2))
        recon = vae.apply(p, z, method=vae.decode)
        mse = jnp.mean((recon - x) ** 2)
        kl = 0.5 * jnp.mean(dist.mean ** 2 + dist.std ** 2
                            - dist.logvar - 1.0)
        return mse + kl_weight * kl, (mse, kl)

    @jax.jit
    def step(p, opt, x, rng):
        (loss, (mse, kl)), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, x, rng)
        updates, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, updates), opt, mse, kl

    rng = np.random.default_rng(7000 + seed)
    key = jax.random.PRNGKey(seed + 11)
    t0 = time.perf_counter()
    for i in range(steps):
        idx = rng.integers(0, n_train, batch)
        x = _dequant(pixels[idx])
        params, opt, mse, kl = step(params, opt, jnp.asarray(x),
                                    jax.random.fold_in(key, i))
        if log_every and ((i + 1) % log_every == 0 or i == 0):
            print(f"[vae] step {i + 1}/{steps} mse {float(mse):.5f} "
                  f"kl {float(kl):.3f} ({(i + 1) / (time.perf_counter() - t0):.2f} steps/s)",
                  flush=True)

    # held-out recon PSNR + latent statistics
    xh = jnp.asarray(_dequant(pixels[n_train:]))

    @jax.jit
    def encode_mean(p, x):
        moments = vae.apply(p, x, method=vae.encode_moments)
        return jnp.split(moments, 2, axis=1)[0]

    @jax.jit
    def decode(p, z):
        return vae.apply(p, z, method=vae.decode)

    z = encode_mean(params, xh)
    recon = np.asarray(decode(params, z))
    mse = float(np.mean((recon - np.asarray(xh)) ** 2))
    psnr = 10 * np.log10(4.0 / mse)  # [-1,1] images -> peak-to-peak 2
    lat_scale = float(1.0 / np.asarray(z).std())
    return vae, params, {"recon_psnr_db": round(psnr, 2),
                         "latent_scale": round(lat_scale, 5),
                         "latent_hw": int(z.shape[-1])}


# ---------------------------------------------------------------------------
# feature extraction + latent-DiT training (the reference's exact contract:
# encode the dataset once, epoch over the cached scaled latents)
# ---------------------------------------------------------------------------

def encode_dataset(vae, vae_params, pixels, lat_scale, *, batch=64, seed=0):
    """One posterior sample per image, scaled — this study's
    `extract_features.py` (reference extract_features.py:166-171)."""
    import jax
    import jax.numpy as jnp
    from fast_dit_tpu.models.vae import DiagonalGaussian

    @jax.jit
    def encode(x, rng):
        moments = vae.apply(vae_params, x, method=vae.encode_moments)
        dist = DiagonalGaussian(jnp.transpose(moments, (0, 2, 3, 1)))
        z = jnp.transpose(dist.sample(rng), (0, 3, 1, 2))
        return z * lat_scale  # reference extract_features.py:168 semantics

    key = jax.random.PRNGKey(1234 + seed)
    out = []
    for i in range(0, len(pixels), batch):
        x = jnp.asarray(_dequant(pixels[i: i + batch]))
        out.append(np.asarray(encode(x, jax.random.fold_in(key, i))))
    return np.concatenate(out)


def train_latent_dit(latents, labels, *, model_name="DiT-S/2",
                     steps=6000, batch=256, lr=1e-4,
                     ema_decay=0.999, seed=0, log_every=500, n_train=None):
    """Train DiT on the cached scaled latents — the reference's train.py
    data contract (pre-extracted .npy features, epoched)."""
    import jax
    import jax.numpy as jnp
    from fast_dit_tpu.data.synthetic import NUM_CLASSES
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.train.train_lib import create_train_state, make_train_step

    n_train = len(latents) if n_train is None else n_train
    model = DiT_models[model_name](
        input_size=latents.shape[-1], in_channels=4, num_classes=NUM_CLASSES,
        dtype=jnp.bfloat16, remat=True)
    diffusion = create_diffusion(timestep_respacing="")
    state, tx = create_train_state(model, jax.random.PRNGKey(seed), lr=lr)
    train_step = make_train_step(model, diffusion.schedule, tx,
                                 ema_decay=ema_decay)

    step_fn = jax.jit(train_step, donate_argnums=(0,))
    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    metrics = None
    t0 = time.perf_counter()
    for i in range(steps):
        idx = rng.integers(0, n_train, batch)
        state, metrics = step_fn(
            state, {"x": jnp.asarray(latents[idx]),
                    "y": jnp.asarray(labels[idx])},
            jax.random.fold_in(key, 2 * i + 1))
        if log_every and ((i + 1) % log_every == 0 or i == 0):
            dt = time.perf_counter() - t0
            print(f"[latent-dit] step {i + 1}/{steps} loss "
                  f"{float(metrics['loss']):.4f} ({(i + 1) / dt:.2f} steps/s)",
                  flush=True)
    return model, jax.device_get(state.ema), float(metrics["loss"])


# ---------------------------------------------------------------------------
# judge CNN on the cached dataset (fresh per-step rendering at 256² costs
# ~3 s/batch on this single-core host — see module doc)
# ---------------------------------------------------------------------------

def train_judge_cached(pixels, labels, *, steps=800, batch=64, lr=1e-3,
                       seed=0, holdout=1024, log_every=200):
    """Same judge design as quality_study.train_classifier, trained from the
    cached pixels; the LAST `holdout` images measure generalization."""
    import jax
    import jax.numpy as jnp
    import optax
    from benchmarks.quality_study import build_classifier

    n_train = len(pixels) - holdout
    clf = build_classifier()
    image_size = pixels.shape[-1]
    params = clf.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, 3, image_size, image_size)))
    tx = optax.adam(lr)
    opt = tx.init(params)

    def loss_fn(p, x, y):
        logits, _ = clf.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()

    @jax.jit
    def step(p, opt, x, y):
        loss, g = jax.value_and_grad(loss_fn)(p, x, y)
        updates, opt = tx.update(g, opt, p)
        return optax.apply_updates(p, updates), opt, loss

    rng = np.random.default_rng(1000 + seed)
    for i in range(steps):
        idx = rng.integers(0, n_train, batch)
        params, opt, loss = step(params, opt,
                                 jnp.asarray(_dequant(pixels[idx])),
                                 jnp.asarray(labels[idx]))
        if log_every and ((i + 1) % log_every == 0 or i == 0):
            print(f"[clf] step {i + 1}/{steps} loss {float(loss):.4f}",
                  flush=True)

    @jax.jit
    def preds(p, x):
        return jnp.argmax(clf.apply(p, x)[0], -1)

    correct = 0
    for i in range(n_train, len(pixels), batch):
        ph = preds(params, jnp.asarray(_dequant(pixels[i: i + batch])))
        correct += int((np.asarray(ph) == labels[i: i + batch]).sum())
    return params, clf.apply, correct / holdout


# ---------------------------------------------------------------------------
# evaluation: sample latents -> decode -> judge
# ---------------------------------------------------------------------------

def default_configs():
    return [("ddpm", 250, 1, 1.5),
            ("ddpm", 250, 2, 1.5),
            ("ddpm", 250, 3, 1.5),
            ("ddpm", 250, 1, 1.5, 0.0, False, "uniform", (0.19, 1.61)),
            ("ddpm", 250, 2, 1.5, 0.0, False, "uniform", (0.19, 1.61)),
            ("ddim", 50, 1, 1.5),
            ("dpm", 25, 1, 1.5),
            ("ddpm", 250, 1, 1.0)]


def evaluate(model, ema, vae, vae_params, lat_scale, clf_params, clf_apply,
             *, image_size, num_eval=1024, batch=64, eval_seeds=3,
             configs=None, jsonl_path=None, grid_dir=None):
    import jax
    import jax.numpy as jnp
    from fast_dit_tpu.data.synthetic import NUM_CLASSES, synth_batch
    from fast_dit_tpu.nvs.metrics import compute_fid, compute_kid
    from fast_dit_tpu.utils.image import save_image

    configs = default_configs() if configs is None else configs
    assert num_eval % batch == 0
    labels = (np.arange(num_eval) % NUM_CLASSES).astype(np.int64)

    feat_jit = jax.jit(lambda x: clf_apply(clf_params, x))

    @jax.jit
    def decode(z):
        img = vae.apply(vae_params, z / lat_scale, method=vae.decode)
        return jnp.clip(img, -1.0, 1.0)

    def features_and_preds(images):
        feats, preds = [], []
        for i in range(0, len(images), batch):
            logits, f = feat_jit(jnp.asarray(images[i: i + batch]))
            feats.append(np.asarray(f))
            preds.append(np.argmax(np.asarray(logits), -1))
        return np.concatenate(feats), np.concatenate(preds)

    real_a = np.concatenate([
        synth_batch(labels[i: i + batch], seed=4_000_000 + i,
                    image_size=image_size)
        for i in range(0, num_eval, batch)])
    real_b = np.concatenate([
        synth_batch(labels[i: i + batch], seed=5_000_000 + i,
                    image_size=image_size)
        for i in range(0, num_eval, batch)])
    feats_a, preds_a = features_and_preds(real_a)
    feats_b, _ = features_and_preds(real_b)
    ident = lambda f: f
    rows = [{
        "config": "real-vs-real (floor)",
        "fid": round(compute_fid(feats_a, feats_b, ident), 4),
        "kid": round(compute_kid(feats_a, feats_b, ident)[0], 6),
        "cls_acc": round(float((preds_a == labels).mean()), 4),
        "num_eval": num_eval,
    }]
    print(json.dumps(rows[0]), flush=True)

    for cfg_row in configs:
        sampler, steps, interval, cfg = cfg_row[:4]
        tome = cfg_row[4] if len(cfg_row) > 4 else 0.0
        tome_mlp = cfg_row[5] if len(cfg_row) > 5 else False
        csched = cfg_row[6] if len(cfg_row) > 6 else "uniform"
        band = cfg_row[7] if len(cfg_row) > 7 else None
        run = make_sampler(model, ema, sampler, steps, interval, cfg, tome,
                           tome_mlp, csched, band, batch=batch,
                           clip_denoised=False)
        fids, kids, accs, times = [], [], [], []
        grid_images = None
        for s in range(eval_seeds):
            gen = []
            for i in range(0, num_eval, batch):
                y = jnp.asarray(labels[i: i + batch])
                t0 = time.perf_counter()
                z = run(y, jax.random.PRNGKey(9000 + 100_000 * s + i))
                img = np.asarray(jax.device_get(decode(z)), np.float32)
                times.append(time.perf_counter() - t0)
                gen.append(img)
            gen = np.concatenate(gen)
            feats_g, preds_g = features_and_preds(gen)
            fids.append(compute_fid(feats_a, feats_g, ident))
            kids.append(compute_kid(feats_a, feats_g, ident)[0])
            accs.append(float((preds_g == labels).mean()))
            if s == 0:
                grid_images = gen[:16]
        steady = (sorted(times[1:])[len(times[1:]) // 2]
                  if len(times) > 1 else times[0])
        name = (f"{sampler}{steps}"
                + (f" k={interval}" if interval > 1 else "")
                + (f" band={band[0]}-{band[1]}" if band is not None else "")
                + (" no-cfg" if cfg <= 1.0 else ""))
        row = {
            "config": name, "sampler": sampler, "steps": steps,
            "cache_interval": interval, "cfg_scale": cfg,
            "cfg_interval": list(band) if band is not None else None,
            "fid": round(float(np.mean(fids)), 4),
            "fid_std": round(float(np.std(fids)), 4),
            "kid": round(float(np.mean(kids)), 6),
            "cls_acc": round(float(np.mean(accs)), 4),
            "cls_acc_std": round(float(np.std(accs)), 4),
            "img_per_sec": round(batch / steady, 2),
            "num_eval": num_eval, "eval_seeds": eval_seeds,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if grid_dir and (interval == 1 or band is not None):
            tag = name.replace(" ", "_").replace("=", "")
            save_image(grid_images, os.path.join(
                grid_dir, f"latent_pipeline_{tag}.png"), nrow=4)

    if jsonl_path:
        with open(jsonl_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def _save_tree(path, tree):
    from flax import serialization
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))


def _load_tree(path):
    """Restore a param tree WITHOUT a template (msgpack_restore returns
    plain nested dicts of numpy arrays — flax apply accepts them)."""
    from flax import serialization
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def main():
    from fast_dit_tpu.utils.platform import (maybe_enable_compilation_cache,
                                             maybe_force_cpu)
    maybe_force_cpu()
    maybe_enable_compilation_cache()

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all",
                    choices=["all", "build", "vae", "judge", "dit", "eval"],
                    help="run ONE stage per process. The axon tunnel client "
                         "leaks host RAM roughly linearly in bytes "
                         "transferred host<->device (~130 GB over the full "
                         "256² chain — the kernel OOM-killed the single-"
                         "process run), so the production invocation chains "
                         "build -> vae -> judge -> dit -> eval as five "
                         "processes sharing --out-dir. 'all' remains for "
                         "small sizes/tests.")
    ap.add_argument("--image-size", type=int, default=256,
                    help="pixel resolution; latents are size/8 (256 -> the "
                         "reference 32²-latent contract, 512 -> 64² latents"
                         " / 1024 tokens)")
    ap.add_argument("--dataset-size", type=int, default=25600,
                    help="finite pixel dataset rendered once (~12 s per 256 "
                         "images at 256² on this single-core host); the DiT "
                         "epochs over its cached latents exactly like the "
                         "reference's feature pipeline")
    ap.add_argument("--vae-steps", type=int, default=1500)
    ap.add_argument("--vae-batch", type=int, default=16)
    ap.add_argument("--dit-steps", type=int, default=6000)
    ap.add_argument("--dit-batch", type=int, default=256)
    ap.add_argument("--clf-steps", type=int, default=800)
    ap.add_argument("--num-eval", type=int, default=1024)
    ap.add_argument("--eval-batch", type=int, default=64)
    ap.add_argument("--eval-seeds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--grid-dir", default=None)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    holdout = min(1024, args.dataset_size // 4)
    d = lambda name: os.path.join(args.out_dir, name)
    meta_path = d("study_meta.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    def save_meta():
        with open(meta_path, "w") as f:
            json.dump(meta, f)

    import jax
    import jax.numpy as jnp
    from fast_dit_tpu.data.synthetic import NUM_CLASSES
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.models.vae import AutoencoderKL

    if args.phase in ("all", "build"):
        pixels, labels = build_pixel_dataset(
            args.dataset_size, args.image_size, seed=args.seed)
        np.save(d("pixels.npy"), pixels)
        np.save(d("labels.npy"), labels)
    else:
        pixels = np.load(d("pixels.npy"))
        labels = np.load(d("labels.npy"))

    if args.phase in ("all", "vae"):
        vae, vae_params, vmet = train_vae(
            pixels[: len(pixels) - holdout], steps=args.vae_steps,
            batch=args.vae_batch, seed=args.seed)
        print(json.dumps({"vae": vmet}), flush=True)
        _save_tree(d("vae_params.msgpack"), vae_params)
        meta.update(vae=vmet, image_size=args.image_size,
                    vae_steps=args.vae_steps)
        save_meta()
        latents = encode_dataset(vae, vae_params, pixels,
                                 vmet["latent_scale"],
                                 batch=args.eval_batch, seed=args.seed)
        np.save(d("latents.npy"), latents)
        print(json.dumps({"latents": list(latents.shape)}), flush=True)
    elif args.phase in ("judge", "dit", "eval"):
        vmet = meta["vae"]
        vae = AutoencoderKL(block_out_channels=(32, 64, 128, 128))
        vae_params = (_load_tree(d("vae_params.msgpack"))
                      if args.phase == "eval" else None)

    if args.phase in ("all", "judge"):
        clf_params, clf_apply, clf_acc = train_judge_cached(
            pixels, labels, steps=args.clf_steps, holdout=holdout,
            seed=args.seed)
        print(json.dumps({"judge_holdout_acc": clf_acc}), flush=True)
        _save_tree(d("clf_params.msgpack"), clf_params)
        meta.update(judge_holdout_acc=clf_acc)
        save_meta()

    if args.phase in ("all", "dit"):
        latents = (np.load(d("latents.npy")) if args.phase == "dit"
                   else latents)
        model, ema, loss = train_latent_dit(
            latents, labels, steps=args.dit_steps, batch=args.dit_batch,
            seed=args.seed, n_train=len(latents) - holdout)
        print(json.dumps({"latent_dit_final_loss": round(loss, 4)}),
              flush=True)
        _save_tree(d("dit_ema.msgpack"), ema)
        meta.update(latent_dit_final_loss=round(loss, 4),
                    dit_steps=args.dit_steps,
                    latent_hw=int(latents.shape[-1]))
        save_meta()

    if args.phase in ("all", "eval"):
        if args.phase == "eval":
            from benchmarks.quality_study import build_classifier
            clf_apply = build_classifier().apply
            clf_params = _load_tree(d("clf_params.msgpack"))
            clf_acc = meta["judge_holdout_acc"]
            model = DiT_models["DiT-S/2"](
                input_size=meta["latent_hw"], in_channels=4,
                num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
            ema = _load_tree(d("dit_ema.msgpack"))
            loss = meta["latent_dit_final_loss"]
        rows = evaluate(model, ema, vae, vae_params, vmet["latent_scale"],
                        clf_params, clf_apply, image_size=args.image_size,
                        num_eval=args.num_eval, batch=args.eval_batch,
                        eval_seeds=args.eval_seeds, jsonl_path=args.jsonl,
                        grid_dir=args.grid_dir)
        # prepend run metadata into the jsonl
        if args.jsonl:
            hdr = {"meta": {"image_size": args.image_size, "vae": vmet,
                            "judge_holdout_acc": clf_acc,
                            "latent_dit_final_loss": loss,
                            "dit_steps": meta.get("dit_steps",
                                                  args.dit_steps),
                            "vae_steps": meta.get("vae_steps",
                                                  args.vae_steps)}}
            with open(args.jsonl) as f:
                body = f.read()
            with open(args.jsonl, "w") as f:
                f.write(json.dumps(hdr) + "\n" + body)
        print(json.dumps({"rows": len(rows)}), flush=True)


if __name__ == "__main__":
    main()
