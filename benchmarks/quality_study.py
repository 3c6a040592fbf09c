"""Genuine quality-vs-speed curves on an offline-trainable dataset.

The FORA-cache / DDIM / DPM-Solver throughput numbers in docs/ABLATIONS.md
are weight-independent, but their *quality* columns were mechanism-level
(latent drift under perturbed-random weights) because the reference's
pretrained ImageNet checkpoints don't exist in this offline environment
(`/root/reference/README.md:95-125`). This study closes that gap the honest
way available offline: train a DiT from scratch (pixel space, 32x32) on the
procedural class-conditional dataset (`fast_dit_tpu/data/synthetic.py`),
train an independent CNN classifier on the same distribution, then measure

  - FID / KID in the classifier's LEARNED feature space (not random
    projections), generated set vs a held-out real set,
  - class-conditional accuracy (does CFG sampling produce the requested
    class, judged by the independent classifier),
  - throughput (img/s on the current device)

for every fast-sampling configuration: {ddpm250} x {cache k=1..4},
ddim{100,50} (+cache), DPM-Solver++(2M) at {25,15,10} steps, and a
no-guidance row. Everything is deterministic given the seeds.

Usage (full study, one TPU chip, ~15 min):
    python benchmarks/quality_study.py --out-dir /tmp/qstudy \
        --jsonl performance/v5e/quality_study_s2.jsonl --grid-dir docs
Phases can run separately via --phase train|eval (train saves checkpoints
into --out-dir; eval reuses them).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _lazy_imports():
    import jax
    import jax.numpy as jnp
    return jax, jnp


# ---------------------------------------------------------------------------
# independent judge: a small CNN classifier trained on the real distribution
# ---------------------------------------------------------------------------

def build_classifier():
    from flax import linen as nn

    class SmallCNN(nn.Module):
        """3-stage strided CNN; penultimate GAP features are the FID space."""
        num_classes: int = 10

        @nn.compact
        def __call__(self, x):  # (B, 3, H, W) in [-1, 1]
            x = x.transpose(0, 2, 3, 1)
            for f in (32, 64, 128):
                x = nn.relu(nn.Conv(f, (3, 3), strides=(2, 2))(x))
                x = nn.relu(nn.Conv(f, (3, 3))(x))
            feat = x.mean(axis=(1, 2))             # (B, 128)
            logits = nn.Dense(self.num_classes)(feat)
            return logits, feat

    return SmallCNN()


def train_classifier(*, image_size=32, steps=800, batch=256, lr=1e-3,
                     seed=0, log_every=200, num_train=0):
    """Train the judge CNN on its own synthetic stream (seeds disjoint from
    the DiT's); returns (params, apply_fn, holdout_accuracy)."""
    jax, jnp = _lazy_imports()
    import optax
    from fast_dit_tpu.data.synthetic import NUM_CLASSES, synth_batch

    clf = build_classifier()
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
        y = rng.integers(0, NUM_CLASSES, batch)
        # classifier seeds live in [2_000_000, +steps): disjoint from the
        # DiT train stream and both eval splits
        x = synth_batch(y, seed=2_000_000 + i, image_size=image_size)
        params, opt, loss = step(params, opt, jnp.asarray(x), jnp.asarray(y))
        if log_every and (i + 1) % log_every == 0:
            print(f"[clf] step {i + 1}/{steps} loss {float(loss):.4f}",
                  flush=True)

    # held-out accuracy on a fresh split
    yh = np.arange(1024) % NUM_CLASSES
    xh = synth_batch(yh, seed=3_000_001, image_size=image_size)
    logits, _ = jax.jit(clf.apply)(params, jnp.asarray(xh))
    acc = float((np.argmax(np.asarray(logits), -1) == yh).mean())
    return params, clf.apply, acc


# ---------------------------------------------------------------------------
# DiT training (pixel space) on the procedural dataset
# ---------------------------------------------------------------------------

def train_dit(*, model_name="DiT-S/2", image_size=32, steps=6000, batch=256,
              lr=1e-4, ema_decay=0.999, seed=0, log_every=500,
              attn_backend="auto", optimizer="adamw", objective="eps",
              schedule_sampler="uniform"):
    """Train class-conditional pixel-space DiT with the standard trainer
    (`train/train_lib.py` — the same step train.py jits). Returns
    (model, ema_variables, final_loss).

    optimizer: "adamw" (exact optax AdamW — the default everywhere) or
    "factored" (fused update + Adafactor-style rank-1 second moment,
    `--fused-optimizer --factored-nu` in train.py) — the fast config from
    the round-4 memory work; training a study model with it is the quality
    evidence that decides whether it can become the default."""
    jax, jnp = _lazy_imports()
    from fast_dit_tpu.data.synthetic import NUM_CLASSES, synth_batch
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models
    from fast_dit_tpu.train.train_lib import create_train_state, make_train_step

    model = DiT_models[model_name](
        input_size=image_size, in_channels=3, num_classes=NUM_CLASSES,
        # flow matching predicts a 3-channel velocity (diffusion/flow.py)
        learn_sigma=objective == "eps",
        dtype=jnp.bfloat16, attn_backend=attn_backend,
        remat=True)  # train.py's default: full activations at bs256 OOM 16GB
    diffusion = create_diffusion(timestep_respacing="")  # 1000-step training
    sampler_state = None
    if schedule_sampler != "uniform":
        # loss-second-moment importance resampler (reference
        # timestep_sampler.py:120-150) — the quality-study row that makes it
        # a used feature rather than a parity checkbox
        from fast_dit_tpu.diffusion import create_named_schedule_sampler

        assert objective == "eps", "resampler is discrete-time machinery"
        sampler_state = create_named_schedule_sampler(
            schedule_sampler, diffusion.num_timesteps)
    if optimizer == "factored":
        state, tx = create_train_state(model, jax.random.PRNGKey(seed),
                                       fused_optimizer=True, factored_nu=True,
                                       sampler_state=sampler_state)
    else:
        assert optimizer == "adamw", optimizer
        state, tx = create_train_state(model, jax.random.PRNGKey(seed), lr=lr,
                                       sampler_state=sampler_state)
    step_fn = jax.jit(
        make_train_step(model, diffusion.schedule, tx, ema_decay=ema_decay,
                        lr=lr, objective=objective),
        donate_argnums=(0,))

    rng = np.random.default_rng(seed)
    key = jax.random.PRNGKey(seed + 1)
    metrics = None
    t0 = time.perf_counter()
    for i in range(steps):
        y = rng.integers(0, NUM_CLASSES, batch)
        x = synth_batch(y, seed=i, image_size=image_size)  # fresh data forever
        batch_d = {"x": jnp.asarray(x), "y": jnp.asarray(y)}
        state, metrics = step_fn(state, batch_d, key)
        if log_every and ((i + 1) % log_every == 0 or i == 0):
            dt = time.perf_counter() - t0
            print(f"[dit] step {i + 1}/{steps} loss "
                  f"{float(metrics['loss']):.4f} "
                  f"({(i + 1) / dt:.2f} steps/s)", flush=True)
    loss = float(metrics["loss"]) if metrics is not None else float("nan")
    return model, jax.device_get(state.ema), loss


# ---------------------------------------------------------------------------
# sampling configs + evaluation
# ---------------------------------------------------------------------------

def default_configs():
    # (sampler, steps, cache_interval, cfg_scale[, tome_ratio])
    return ([("ddpm", 250, k, 1.5) for k in (1, 2, 3, 4)]
            + [("ddim", 100, 1, 1.5), ("ddim", 50, 1, 1.5),
               ("ddim", 50, 2, 1.5), ("ddim", 50, 4, 1.5),
               ("dpm", 25, 1, 1.5), ("dpm", 15, 1, 1.5), ("dpm", 10, 1, 1.5),
               # UniPC: DPM++(2M)'s budget + reused-evaluation corrector —
               # does the higher effective order show up at 10-25 steps?
               ("unipc", 25, 1, 1.5), ("unipc", 10, 1, 1.5),
               # Karras sigma spacing for the few-step solvers (2.5-7x lower
               # ODE error at <= 10 steps on the analytic probe)
               ("dpm", 10, 1, 1.5, 0.0, False, "uniform", None, "karras"),
               ("unipc", 10, 1, 1.5, 0.0, False, "uniform", None, "karras"),
               ("ddpm", 250, 1, 1.0),
               # token merging (ops/tome.py): attention-only (default),
               # composed with cache, and the rejected +mlp mode
               ("ddpm", 250, 1, 1.5, 0.5), ("ddpm", 250, 1, 1.5, 0.75),
               ("ddpm", 250, 2, 1.5, 0.5),
               ("ddpm", 250, 1, 1.5, 0.5, True),
               # nonuniform cache-refresh placement: same budget as k=3/4
               ("ddpm", 250, 3, 1.5, 0.0, False, "logsnr"),
               ("ddpm", 250, 4, 1.5, 0.0, False, "logsnr"),
               ("ddpm", 250, 4, 1.5, 0.0, False, "abar"),
               # guidance interval (arXiv:2404.07724): CFG only inside the
               # sigma band — honest compute cut (~0.65x model flops) that
               # the paper shows IMPROVES distribution quality
               ("ddpm", 250, 1, 1.5, 0.0, False, "uniform", (0.19, 1.61)),
               ("ddpm", 250, 1, 1.5, 0.0, False, "uniform", (0.3, 3.0)),
               ("dpm", 25, 1, 1.5, 0.0, False, "uniform", (0.3, 3.0)),
               # composed guidance interval x layer cache (round 4): the
               # multiplicative speed win — does quality hold up?
               ("ddpm", 250, 2, 1.5, 0.0, False, "uniform", (0.19, 1.61)),
               ("ddpm", 250, 3, 1.5, 0.0, False, "uniform", (0.19, 1.61))])


def make_sampler(model, ema, sampler, steps, interval, cfg_scale,
                 tome_ratio=0.0, tome_mlp=False, cache_schedule="uniform",
                 cfg_interval=None, time_spacing="uniform", *,
                 image_size=None, batch, clip_denoised=True):
    """jitted (labels, rng) -> (batch, C, H, W) samples.

    Shapes come from the model itself (model.in_channels x model.input_size²)
    so the same harness drives the pixel-space study (C=3) and latent-space
    DiTs (C=4, decode outside; pass clip_denoised=False there). CFG guides
    3 channels — for pixel models that's full-channel, for 4-channel latents
    it is exactly the reference quirk (models_original.py:262)."""
    jax, jnp = _lazy_imports()
    from fast_dit_tpu.diffusion import create_diffusion

    if tome_ratio > 0:
        model = model.clone(tome_ratio=tome_ratio,  # no params change
                            tome_mlp=tome_mlp)
    is_flow = sampler in ("euler", "heun")
    if is_flow:
        # flow ODE (diffusion/flow.py): continuous time grid, no discrete
        # chain — the cache / sigma band / karras spacing don't apply
        assert interval == 1 and cfg_interval is None, (sampler, interval)
        assert time_spacing == "uniform", time_spacing
        diffusion = None
    elif time_spacing == "karras":
        assert sampler in ("dpm", "unipc"), sampler
        diffusion = create_diffusion(f"karras{steps}")
    else:
        diffusion = create_diffusion(
            f"ddim{steps}" if sampler == "ddim" else str(steps))
    use_cfg = cfg_scale > 1.0
    size = model.input_size

    def fn(params, y, rng):
        shape = (2 * batch if use_cfg else batch, model.in_channels,
                 size, size)
        z = jax.random.normal(jax.random.fold_in(rng, 0), shape)
        if use_cfg:
            yy = jnp.concatenate([y, jnp.full((batch,), model.num_classes)])
            apply = lambda x, t, **kw: model.apply(
                params, x, t, yy, method=model.forward_with_cfg,
                cfg_scale=cfg_scale,
                # flow CFG guides the full velocity (= 3 for pixel models
                # anyway; spelled out for latent flow DiTs)
                guidance_channels=model.in_channels if is_flow else 3, **kw)
            cond_apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
            if cfg_interval is not None and interval == 1:
                from fast_dit_tpu.diffusion import guidance_interval_fn

                apply = guidance_interval_fn(
                    apply, cond_apply, diffusion.schedule, *cfg_interval)
        else:
            apply = lambda x, t, **kw: model.apply(params, x, t, y, **kw)
        if is_flow:
            from fast_dit_tpu.diffusion import flow_sample_loop

            out = flow_sample_loop(apply, z.shape, num_steps=steps,
                                   method=sampler, noise=z)
        elif sampler == "dpm":
            out = diffusion.dpm_solver_sample_loop(
                apply, z.shape, noise=z, clip_denoised=clip_denoised)
        elif sampler == "unipc":
            out = diffusion.unipc_sample_loop(
                apply, z.shape, noise=z, clip_denoised=clip_denoised)
        elif interval == 1:
            loop = (diffusion.p_sample_loop if sampler == "ddpm"
                    else diffusion.ddim_sample_loop)
            out = loop(apply, z.shape, noise=z,
                       rng=jax.random.fold_in(rng, 1), clip_denoised=clip_denoised)
        else:
            forced = None
            if cfg_interval is not None:
                # composed guidance interval x layer cache — same wiring as
                # sample.py: one 2B cache, half-batch out-of-band steps,
                # forced band-entry refresh
                from fast_dit_tpu.diffusion import guidance_interval_cached_fns

                assert use_cfg
                full_fn, cached_fn, forced = guidance_interval_cached_fns(
                    apply, cond_apply, diffusion.schedule, *cfg_interval)
            else:
                full_fn = lambda x, t: apply(x, t, want_cache=True)
                cached_fn = lambda x, t, cache: apply(x, t, cache=cache)
            loop = (diffusion.p_sample_loop_cached if sampler == "ddpm"
                    else diffusion.ddim_sample_loop_cached)
            out = loop(full_fn, cached_fn,
                       z.shape, interval=interval,
                       refresh_schedule=cache_schedule,
                       force_refresh_mask=forced, noise=z,
                       rng=jax.random.fold_in(rng, 1), clip_denoised=clip_denoised)
        return out[:batch]

    jitted = jax.jit(fn)
    return lambda y, rng: jitted(ema, y, rng)


def evaluate_configs(model, ema, clf_params, clf_apply, *, image_size=32,
                     num_eval=2048, batch=256, configs=None, grid_dir=None,
                     jsonl_path=None, throughput_reps=2, eval_seeds=3):
    """Run every sampling config with `eval_seeds` independent noise seeds;
    rows report mean +/- std over seeds so the cls-acc/FID ordering carries
    error bars (a single-seed ordering at num_eval=2048 is within noise for
    nearby configs). Returns the list of result rows."""
    jax, jnp = _lazy_imports()
    from fast_dit_tpu.data.synthetic import NUM_CLASSES, synth_batch
    from fast_dit_tpu.nvs.metrics import compute_fid, compute_kid
    from fast_dit_tpu.utils.image import save_image

    configs = default_configs() if configs is None else configs
    assert num_eval % batch == 0
    labels = (np.arange(num_eval) % NUM_CLASSES).astype(np.int64)

    feat_jit = jax.jit(lambda x: clf_apply(clf_params, x))

    def features_and_preds(images):  # (N, 3, H, W) in [-1, 1]
        feats, preds = [], []
        for i in range(0, len(images), batch):
            logits, f = feat_jit(jnp.asarray(images[i: i + batch]))
            feats.append(np.asarray(f))
            preds.append(np.argmax(np.asarray(logits), -1))
        return np.concatenate(feats), np.concatenate(preds)

    # two disjoint held-out real splits: A is the FID reference, B gives the
    # real-vs-real floor for this N (seeds disjoint from train streams)
    real_a = np.concatenate([
        synth_batch(labels[i: i + batch], seed=4_000_000 + i, image_size=image_size)
        for i in range(0, num_eval, batch)])
    real_b = np.concatenate([
        synth_batch(labels[i: i + batch], seed=5_000_000 + i, image_size=image_size)
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
    if grid_dir:
        save_image(real_a[:40], os.path.join(grid_dir, "quality_study_real.png"),
                   nrow=10)

    for cfg_row in configs:
        sampler, steps, interval, cfg = cfg_row[:4]
        tome = cfg_row[4] if len(cfg_row) > 4 else 0.0
        tome_mlp = cfg_row[5] if len(cfg_row) > 5 else False
        csched = cfg_row[6] if len(cfg_row) > 6 else "uniform"
        band = cfg_row[7] if len(cfg_row) > 7 else None
        spacing = cfg_row[8] if len(cfg_row) > 8 else "uniform"
        run = make_sampler(model, ema, sampler, steps, interval, cfg, tome,
                           tome_mlp, csched, band, spacing,
                           image_size=image_size, batch=batch)
        fids, kids, accs, times = [], [], [], []
        grid_images = None
        for s in range(eval_seeds):
            gen = []
            for i in range(0, num_eval, batch):
                y = jnp.asarray(labels[i: i + batch])
                t0 = time.perf_counter()
                out = np.asarray(
                    jax.device_get(run(y, jax.random.PRNGKey(
                        9000 + 100_000 * s + i))), np.float32)
                times.append(time.perf_counter() - t0)
                gen.append(out)
            gen = np.concatenate(gen)
            feats_g, preds_g = features_and_preds(gen)
            fids.append(compute_fid(feats_a, feats_g, ident))
            kids.append(compute_kid(feats_a, feats_g, ident)[0])
            accs.append(float((preds_g == labels).mean()))
            if s == 0:
                grid_images = gen[:40]
        # steady-state throughput: skip the compile-inclusive first batch
        steady = sorted(times[1:])[len(times[1:]) // 2] if len(times) > 1 else times[0]
        name = (f"{sampler}{steps}"
                + (f" k={interval}" if interval > 1 else "")
                + (f" {csched}" if csched != "uniform" else "")
                + (f" tome={tome}{'+mlp' if tome_mlp else ''}"
                   if tome > 0 else "")
                + (f" band={band[0]}-{band[1]}" if band is not None else "")
                + (" karras" if spacing == "karras" else "")
                + (" no-cfg" if cfg <= 1.0 else ""))
        mean = lambda v: float(np.mean(v))
        std = lambda v: float(np.std(v))
        row = {
            "config": name, "sampler": sampler, "steps": steps,
            "cache_interval": interval, "cfg_scale": cfg,
            "tome_ratio": tome, "tome_mlp": tome_mlp,
            "cache_schedule": csched,
            "cfg_interval": list(band) if band is not None else None,
            "fid": round(mean(fids), 4), "fid_std": round(std(fids), 4),
            "kid": round(mean(kids), 6), "kid_std": round(std(kids), 6),
            "cls_acc": round(mean(accs), 4),
            "cls_acc_std": round(std(accs), 4),
            "time_spacing": spacing,
            "img_per_sec": round(batch / steady, 2),
            "num_eval": num_eval, "eval_seeds": eval_seeds,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
        if grid_dir and (interval in (1, 4) or sampler == "dpm"):
            tag = name.replace(" ", "_").replace("=", "")
            save_image(grid_images, os.path.join(
                grid_dir, f"quality_study_{tag}.png"), nrow=10)

    if jsonl_path:
        with open(jsonl_path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return rows


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def main():
    from fast_dit_tpu.utils.platform import (maybe_enable_compilation_cache,
                                             maybe_force_cpu)
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    import jax
    from flax import serialization

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["all", "train", "eval"])
    ap.add_argument("--model", default="DiT-S/2")
    ap.add_argument("--image-size", type=int, default=32)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--ema-decay", type=float, default=0.999,
                    help="short-run EMA horizon (reference 0.9999 assumes "
                         "400k-step runs)")
    ap.add_argument("--optimizer", default="adamw",
                    choices=["adamw", "factored"],
                    help="'factored' trains with the fused update + rank-1 "
                         "second moment (--fused-optimizer --factored-nu): "
                         "quality evidence for the round-4 fast config")
    ap.add_argument("--schedule-sampler", default="uniform",
                    choices=["uniform", "loss-second-moment"],
                    help="train-time timestep importance sampler (reference "
                         "timestep_sampler.py) — a study row for the "
                         "loss-aware resampler")
    ap.add_argument("--objective", default="eps", choices=["eps", "flow"],
                    help="'flow' trains SiT-style velocity matching "
                         "(diffusion/flow.py) and evaluates the euler/heun "
                         "ODE samplers at matched NFE budgets — the "
                         "trained-model quality evidence for the flow path")
    ap.add_argument("--clf-steps", type=int, default=800)
    ap.add_argument("--num-eval", type=int, default=2048)
    ap.add_argument("--eval-batch", type=int, default=256)
    ap.add_argument("--config-set", default="default",
                    choices=["default", "exact"],
                    help="'exact' evaluates only the exact samplers "
                         "(ddpm250/ddim50/dpm25, no approximations) — enough "
                         "to compare TRAINING variants (e.g. --optimizer "
                         "factored) without re-running the 22-config grid")
    ap.add_argument("--eval-seeds", type=int, default=3,
                    help="independent noise seeds per config; rows report "
                         "mean +/- std (error bars on the quality ordering)")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--jsonl", default=None)
    ap.add_argument("--grid-dir", default=None)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    dit_path = os.path.join(args.out_dir, "dit_ema.msgpack")
    clf_path = os.path.join(args.out_dir, "classifier.msgpack")
    meta_path = os.path.join(args.out_dir, "meta.json")

    if args.phase in ("all", "train"):
        clf_params, _, clf_acc = train_classifier(
            image_size=args.image_size, steps=args.clf_steps, seed=args.seed)
        print(json.dumps({"judge_holdout_acc": clf_acc}), flush=True)
        model, ema, loss = train_dit(
            model_name=args.model, image_size=args.image_size,
            steps=args.steps, batch=args.batch, ema_decay=args.ema_decay,
            seed=args.seed, optimizer=args.optimizer,
            objective=args.objective,
            schedule_sampler=args.schedule_sampler)
        with open(dit_path, "wb") as f:
            f.write(serialization.to_bytes(ema))
        with open(clf_path, "wb") as f:
            f.write(serialization.to_bytes(clf_params))
        with open(meta_path, "w") as f:
            json.dump({"model": args.model, "image_size": args.image_size,
                       "train_steps": args.steps, "batch": args.batch,
                       "ema_decay": args.ema_decay, "final_loss": loss,
                       "judge_holdout_acc": clf_acc, "seed": args.seed,
                       "optimizer": args.optimizer,
                       "schedule_sampler": args.schedule_sampler,
                       "objective": args.objective}, f)

    if args.phase in ("all", "eval"):
        import jax.numpy as jnp
        from fast_dit_tpu.data.synthetic import NUM_CLASSES
        from fast_dit_tpu.models import DiT_models
        with open(meta_path) as f:
            meta = json.load(f)
        objective = meta.get("objective", "eps")
        model = DiT_models[meta["model"]](
            input_size=meta["image_size"], in_channels=3,
            learn_sigma=objective == "eps",
            num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
        template = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 3, meta["image_size"], meta["image_size"])),
            jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
        with open(dit_path, "rb") as f:
            ema = serialization.from_bytes(template, f.read())
        clf = build_classifier()
        clf_t = clf.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 3, meta["image_size"],
                                    meta["image_size"])))
        with open(clf_path, "rb") as f:
            clf_params = serialization.from_bytes(clf_t, f.read())
        print(json.dumps({"meta": meta}), flush=True)
        configs = None
        if objective == "flow":
            # ODE samplers at NFE budgets matching the eps grid's anchors:
            # euler250 ~ ddpm250, heun25/euler50 ~ 50 NFE, euler10 ~ dpm10;
            # tome composes with flow (it lives inside the DiT blocks)
            configs = [("euler", 250, 1, 1.5), ("euler", 50, 1, 1.5),
                       ("heun", 25, 1, 1.5), ("heun", 10, 1, 1.5),
                       ("euler", 10, 1, 1.5), ("euler", 250, 1, 1.0),
                       ("euler", 250, 1, 1.5, 0.5)]
        elif args.config_set == "exact":
            configs = [("ddpm", 250, 1, 1.5), ("ddim", 50, 1, 1.5),
                       ("dpm", 25, 1, 1.5)]
        evaluate_configs(model, ema, clf_params, clf.apply,
                         image_size=meta["image_size"],
                         num_eval=args.num_eval, batch=args.eval_batch,
                         grid_dir=args.grid_dir, jsonl_path=args.jsonl,
                         eval_seeds=args.eval_seeds, configs=configs)


if __name__ == "__main__":
    main()
