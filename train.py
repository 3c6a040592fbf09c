"""Train a DiT on pre-extracted latent features — TPU-native trainer CLI.

Flag-compatible with the reference trainer (`/root/reference/train.py:248-264`
argparse surface; loop semantics :123-245): same defaults, same log-line
format ("Train Loss: ..., Train Steps/Sec: ..."), checkpoints every
--ckpt-every steps. The reference's five train_options/ script forks are
flags here (SURVEY.md §2.2): --no-remat (grad ckpt off), --fp32 (AMP off),
--synthetic-data (features path substitute); --tp/--fsdp add mesh parallelism
the reference never had, and --resume adds the missing resume path.
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.utils.platform import (
    broadcast_string, maybe_enable_compilation_cache, maybe_force_cpu,
    maybe_initialize_distributed)
from fast_dit_tpu.ckpt import CheckpointManager, flax_to_state_dict
from fast_dit_tpu.data import FeatureDataset, feature_batches, synthetic_features
from fast_dit_tpu.diffusion import create_diffusion
from fast_dit_tpu.models import DiT_models
from fast_dit_tpu.parallel import batch_sharding, create_expert_mesh, create_mesh
from fast_dit_tpu.train import create_train_state, make_sharded_train_step
from fast_dit_tpu.utils import create_logger, make_experiment_dir
from fast_dit_tpu.utils.logging import find_latest_experiment_dir


def main(args):
    maybe_force_cpu()
    maybe_enable_compilation_cache()
    maybe_initialize_distributed()
    # the reference's TF32 on/off ablation (train_tf32_disabled.py:12-13)
    # maps to XLA's matmul precision: "default" = fast (bf16 passes),
    # "highest" = full fp32 MXU passes
    jax.config.update("jax_default_matmul_precision", args.matmul_precision)
    is_main = jax.process_index() == 0
    # rank 0 allocates the dir; every host learns the same path (orbax needs
    # one common checkpoint directory on multi-host). --resume re-enters the
    # latest existing experiment dir instead of auto-incrementing a fresh one.
    if is_main:
        experiment_dir = (
            find_latest_experiment_dir(args.results_dir, args.model)
            if args.resume else None) or make_experiment_dir(
                args.results_dir, args.model)
    else:
        experiment_dir = None
    experiment_dir = broadcast_string(experiment_dir)
    logger = create_logger(experiment_dir, is_main=is_main)
    logger.info(f"Experiment directory created at {experiment_dir}")

    assert args.image_size % 8 == 0, "Image size must be divisible by 8 (for the VAE encoder)."
    n_data = len(jax.devices()) // max(args.tp, args.ep)
    assert args.global_batch_size % (n_data * args.grad_accum) == 0, (
        f"global batch {args.global_batch_size} must be divisible by "
        f"data-axis size {n_data} x grad_accum {args.grad_accum}")
    latent_size = args.image_size // 8
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    model = DiT_models[args.model](
        input_size=latent_size, num_classes=args.num_classes,
        # flow matching predicts a velocity with in_channels channels — no
        # learned-sigma head (diffusion/flow.py)
        learn_sigma=args.objective == "eps",
        dtype=dtype, remat=not args.no_remat, remat_policy=args.remat_policy,
        attn_backend=args.attn_backend, scan_unroll=args.scan_unroll)

    if args.ep > 1:
        # expert parallelism (MoE models, models/moe.py): a ('data',
        # 'expert') mesh; the expert axis of the routed FFN weights shards
        # over 'expert' (parallel/mesh.py _EP_PARAM). tp and ep build
        # different meshes — pick one
        assert args.tp == 1, "--tp and --ep are mutually exclusive meshes"
        assert getattr(model, "moe_experts", 0) % args.ep == 0 and \
            model.moe_experts >= args.ep, (
            f"--ep {args.ep} must divide the model's expert count "
            f"({getattr(model, 'moe_experts', 0)}); pick a DiT-MoE-* model")
        mesh = create_expert_mesh(args.ep)
    else:
        mesh = create_mesh(model=args.tp)
    diffusion = create_diffusion(timestep_respacing="")  # 1000-step training process
    sampler_state = None
    if args.objective == "flow":
        assert args.schedule_sampler == "uniform", (
            "--schedule-sampler is discrete-time machinery; flow matching "
            "draws continuous t")
    if args.schedule_sampler != "uniform":
        from fast_dit_tpu.diffusion import create_named_schedule_sampler
        sampler_state = create_named_schedule_sampler(
            args.schedule_sampler, diffusion.num_timesteps)
    state, tx = create_train_state(model, jax.random.PRNGKey(args.global_seed),
                                   # the fused update takes lr from
                                   # make_sharded_train_step below instead
                                   lr=None if args.fused_optimizer else args.lr,
                                   mixed_precision=args.mixed_precision,
                                   fused_optimizer=args.fused_optimizer,
                                   nu_dtype=(jnp.bfloat16
                                             if args.nu_dtype == "bf16"
                                             else None),
                                   factored_nu=args.factored_nu,
                                   sampler_state=sampler_state)
    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    logger.info(f"DiT Parameters: {n_params:,}")

    train_step, st_sh = make_sharded_train_step(
        model, diffusion.schedule, tx, mesh, tp=args.tp > 1, fsdp=args.fsdp,
        grad_accum=args.grad_accum, ema_decay=args.ema_decay, lr=args.lr,
        objective=args.objective, flow_path=args.flow_path,
        moe_aux_weight=args.moe_aux_weight, moe_z_weight=args.moe_z_weight,
        example_state=state)
    state = jax.device_put(state, st_sh)
    data_sh = {"x": batch_sharding(mesh), "y": batch_sharding(mesh)}

    # orbax is multi-host aware: every process participates in save/restore
    # (a rank-0-only manager silently diverges params across hosts on resume)
    ckpt_mgr = CheckpointManager(f"{experiment_dir}/checkpoints")
    if args.resume and ckpt_mgr.latest_step() is not None:
        template = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            if isinstance(x, jax.Array) else x, state)
        state = ckpt_mgr.restore(template=template)
        logger.info(f"Resumed from checkpoint at step {int(state.step)}")

    if args.synthetic_data:
        epochs_iter = [synthetic_features(
            args.global_batch_size, latent_size=latent_size,
            num_classes=args.num_classes, seed=args.global_seed)]
        logger.info("Using synthetic latent features")
    else:
        feat_dir = f"{args.feature_path}/imagenet{args.image_size}_features"
        label_dir = f"{args.feature_path}/imagenet{args.image_size}_labels"
        dataset = FeatureDataset(feat_dir, label_dir)
        logger.info(f"Dataset contains {len(dataset):,} features "
                    f"({args.feature_path})")
        if args.native_loader:
            from fast_dit_tpu.data.native_loader import NativeFeatureLoader
            epochs_iter = [
                NativeFeatureLoader(
                    feat_dir, label_dir, args.global_batch_size,
                    seed=args.global_seed + e, num_epochs=1,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    num_threads=args.num_workers)
                for e in range(args.epochs)
            ]
            logger.info("Using the native C++ feature loader")
        else:
            epochs_iter = [
                feature_batches(dataset, args.global_batch_size,
                                seed=args.global_seed + e, num_epochs=1,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())
                for e in range(args.epochs)
            ]

    if args.profile_dir:
        # TPU-native tracing (SURVEY.md §5: the reference has none; its only
        # instrumentation is the steps/sec log line)
        jax.profiler.start_trace(args.profile_dir)

    rng = jax.random.PRNGKey(args.global_seed)
    train_steps = int(state.step)
    log_steps, running_loss = 0, 0.0
    start_time = time.time()
    logger.info(f"Training for {args.epochs} epochs...")

    # Preemption-safe shutdown: checkpoint on SIGTERM/SIGINT, then exit
    # cleanly (the reference dies with a raw traceback when slurm kills it,
    # SURVEY.md §5 'failure detection: none').
    import signal

    preempted = {"flag": False}

    def _on_signal(signum, frame):
        logger.info(f"Received signal {signum}; checkpointing before exit...")
        preempted["flag"] = True

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)

    done = False
    for epoch, batches in enumerate(epochs_iter):
        logger.info(f"Beginning epoch {epoch}...")
        for batch in batches:
            batch = jax.device_put(batch, data_sh)
            state, metrics = train_step(state, batch, rng)
            running_loss += metrics["loss"]
            train_steps += 1
            log_steps += 1

            if train_steps % args.log_every == 0:
                jax.block_until_ready(metrics["loss"])  # reference: cuda.synchronize
                end_time = time.time()
                steps_per_sec = log_steps / (end_time - start_time)
                avg_loss = float(running_loss) / log_steps
                logger.info(f"(step={train_steps:07d}) Train Loss: {avg_loss:.4f}, "
                            f"Train Steps/Sec: {steps_per_sec:.2f}")
                running_loss, log_steps = 0.0, 0
                start_time = time.time()

            if train_steps % args.ckpt_every == 0 and train_steps > 0:
                # pass device arrays: orbax copies to host synchronously
                # before the async write, and this works on multi-host
                # shardings where device_get would raise
                ckpt_mgr.save(train_steps, state)
                logger.info(f"Saved checkpoint at step {train_steps} "
                            f"to {experiment_dir}/checkpoints")

            if preempted["flag"] or (args.max_steps and train_steps >= args.max_steps):
                done = True
                break
        if done:
            break

    # training is over: stop swallowing signals. (The handler above exists so
    # a SIGTERM mid-epoch checkpoints before exit; leaving it installed made
    # the process unkillable-by-SIGTERM during the final save below.)
    signal.signal(signal.SIGTERM, signal.SIG_DFL)
    signal.signal(signal.SIGINT, signal.SIG_DFL)

    if args.profile_dir:
        jax.profiler.stop_trace()
        logger.info(f"Wrote profiler trace to {args.profile_dir}")

    ckpt_mgr.save(train_steps, state, force=True)
    ckpt_mgr.wait_until_finished()
    if args.export_pt and getattr(model, "moe_experts", 0) > 0:
        logger.warning(
            "--export-pt skipped: MoE param trees (routed expert MLPs) have "
            "no reference torch format; torch export supports dense DiT only")
    elif args.export_pt and jax.process_count() == 1:
        import torch
        sd = flax_to_state_dict(jax.device_get(state.ema),
                                patch_size=model.patch_size,
                                in_channels=model.in_channels,
                                input_size=latent_size)
        torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
                   f"{experiment_dir}/checkpoints/{train_steps:07d}-ema.pt")
        logger.info(f"Exported torch-compatible EMA checkpoint at step {train_steps}")
    elif args.export_pt:
        logger.warning(
            "--export-pt skipped: torch export needs a full local copy of "
            "the EMA and runs single-host only (device_get raises on "
            "multi-host shardings); convert the orbax checkpoint offline "
            "with ckpt/torch_import.flax_to_state_dict instead")
    ckpt_mgr.close()
    logger.info("Done!")


def parse_args():
    # reference-compatible flags (train.py:248-264)
    parser = argparse.ArgumentParser()
    parser.add_argument("--feature-path", type=str, default="features")
    parser.add_argument("--results-dir", type=str, default="results")
    parser.add_argument("--model", type=str, choices=list(DiT_models.keys()),
                        default="DiT-XL/2")
    parser.add_argument("--image-size", type=int, choices=[256, 512], default=256)
    parser.add_argument("--num-classes", type=int, default=1000)
    parser.add_argument("--epochs", type=int, default=1400)
    parser.add_argument("--global-batch-size", type=int, default=256)
    parser.add_argument("--global-seed", type=int, default=0)
    parser.add_argument("--vae", type=str, choices=["ema", "mse"], default="ema")
    parser.add_argument("--num-workers", type=int, default=4)
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("--ckpt-every", type=int, default=50_000)
    # TPU-native extensions (ring-2 ablations as flags + mesh parallelism)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ema-decay", type=float, default=0.9999)
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel axis size")
    parser.add_argument("--moe-aux-weight", type=float, default=1e-2,
                        help="Switch load-balance aux-loss weight (MoE models)")
    parser.add_argument("--moe-z-weight", type=float, default=1e-3,
                        help="ST-MoE router z-loss weight (MoE models)")
    parser.add_argument("--ep", type=int, default=1,
                        help="expert-parallel axis size (DiT-MoE-* models: "
                             "shards the routed FFN expert axis over a "
                             "('data','expert') mesh)")
    parser.add_argument("--fsdp", action="store_true", help="shard params over data axis")
    parser.add_argument("--grad-accum", type=int, default=1)
    parser.add_argument("--fp32", action="store_true", help="disable bf16 activations")
    parser.add_argument("--no-remat", action="store_true",
                        help="disable per-block gradient checkpointing")
    parser.add_argument("--remat-policy", type=str, default="nothing",
                        choices=["nothing", "attn", "attn_mlp"],
                        help="selective remat: what the backward keeps "
                             "instead of recomputing")
    parser.add_argument("--attn-backend", type=str, default="auto",
                        choices=["auto", "xla", "pallas", "einsum"])
    parser.add_argument("--scan-unroll", type=int, default=1,
                        help="lax.scan unroll factor over the block stack")
    parser.add_argument("--objective", type=str, default="eps",
                        choices=["eps", "flow"],
                        help="training objective: 'eps' = the reference's "
                             "DDPM eps/learned-sigma hybrid; 'flow' = "
                             "SiT-style velocity flow matching "
                             "(diffusion/flow.py; sample with "
                             "--sampler euler/heun)")
    parser.add_argument("--flow-path", type=str, default="linear",
                        choices=["linear", "gvp"],
                        help="flow interpolant path (--objective flow): "
                             "linear = rectified flow; gvp = "
                             "variance-preserving cos/sin")
    parser.add_argument("--synthetic-data", action="store_true")
    parser.add_argument("--schedule-sampler", type=str, default="uniform",
                        choices=["uniform", "loss-second-moment"])
    parser.add_argument("--mixed-precision", action="store_true",
                        help="bf16 params + fp32 master weights (fits XL/2 "
                             "Adam training in 16GB HBM)")
    parser.add_argument("--fused-optimizer", action="store_true",
                        help="single-sweep fused AdamW+EMA update (implies "
                             "mixed precision; ~2x faster optimizer step)")
    parser.add_argument("--nu-dtype", type=str, default="fp32",
                        choices=["fp32", "bf16"],
                        help="second-moment storage dtype (fused optimizer "
                             "only); bf16 halves nu HBM at coarser adaptive "
                             "scale resolution")
    parser.add_argument("--factored-nu", action="store_true",
                        help="Adafactor-style rank-1 second moment (fused "
                             "optimizer only): ~zero nu HBM, frees ~2.7GB on "
                             "XL/2 — pairs with --remat-policy attn in 16GB")
    parser.add_argument("--max-steps", type=int, default=0)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--profile-dir", type=str, default=None,
                        help="write a jax.profiler trace here")
    parser.add_argument("--matmul-precision", type=str, default="default",
                        choices=["default", "high", "highest"],
                        help="XLA matmul precision (the TF32-toggle ablation)")
    parser.add_argument("--native-loader", action="store_true",
                        help="use the C++ feature loader (no GIL in the IO path)")
    parser.add_argument("--export-pt", action="store_true",
                        help="also export a torch-compatible EMA .pt at the end")
    return parser.parse_args()


if __name__ == "__main__":
    main(parse_args())
