"""End-to-end novel-view-synthesis demo: warp -> mask -> inpaint -> metrics.

The reference demonstrates its ring-3 NVS capability through standalone
scripts chained by hand on hard-coded ScanNet frames: a depth-based warp
(`/root/reference/warp-image-by-depth.py:95-146`), hole masking + SD
inpainting (`/root/reference/inpainting.py:61-99`), the epipolar-attention
demo (`/root/reference/models.py:1120-1315`), and the metric suite
(`/root/reference/evaluation-metrics.py`). This tool chains the same
capabilities as ONE runnable pipeline on a fully synthetic two-view scene,
so it works offline and is CI-testable:

  1. scene: a textured plane at constant depth, two pinhole cameras
     (`nvs.geometry.relative_pose`);
  2. ground-truth target view via the EXACT planar homography
     (`nvs.warp.homography_from_pose` + `warp_image_homography`);
  3. depth-based forward warp of the source into the target view
     (`nvs.warp.warp_image_by_depth`) — scattering leaves disocclusion
     holes;
  4. hole mask from black pixels (`nvs.inpaint.mask_from_black_pixels`,
     the reference's mask construction);
  5. RePaint-style diffusion inpainting of the holes with a DiT
     (`nvs.inpaint.inpaint_sample_loop`) — or, with `--nvs-model`, the
     fork-variant `DiTNVS` conditioned on source-view feature maps through
     its DINO cross-attention layers (a stub feature extractor stands in
     for DINO offline: average-pooled source patches under a fixed random
     projection);
  6. report: PSNR/SSIM vs the homography ground truth (full image and
     warped-only region), coverage, and visualization PNGs
     (`utils.viz.error_heatmap`, `depth_to_color`).

Random-init weights fill holes with (structured) noise — like
validate_pretrained's --dry-run, this proves the PIPELINE; pass --ckpt to
use trained DiT weights when available.
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def make_scene(size):
    """Textured plane at constant depth + two cameras. Returns
    (src_img [H,W,3] float01, depth [H,W], K, (R1,t1), (R2,t2))."""
    import jax.numpy as jnp

    h = w = size
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    checker = ((xx // (size // 8) + yy // (size // 8)) % 2)
    img = np.stack([
        0.15 + 0.7 * checker,
        0.2 + 0.6 * (xx / w),
        0.25 + 0.6 * (yy / h),
    ], axis=-1).astype(np.float32)
    # a few colored squares for structure
    rs = np.random.RandomState(0)
    for _ in range(6):
        cy, cx = rs.randint(4, h - 12, 2)
        s = rs.randint(3, max(4, size // 6))
        img[cy:cy + s, cx:cx + s] = rs.rand(3) * 0.8 + 0.1
    d0 = 2.0
    depth = np.full((h, w), d0, np.float32)
    f = 1.2 * size
    K = jnp.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]], jnp.float32)
    R1, t1 = jnp.eye(3), jnp.zeros(3)
    ang = 0.06
    R2 = jnp.array([[np.cos(ang), 0, np.sin(ang)],
                    [0, 1, 0],
                    [-np.sin(ang), 0, np.cos(ang)]], jnp.float32)
    t2 = jnp.array([0.12, 0.03, 0.0], jnp.float32)
    return img, depth, K, (R1, t1), (R2, t2), d0


def make_stub_features(src_img, grid, dim, seed=0):
    """Offline stand-in for DINO: average-pool the source image to a
    (grid, grid) map and lift 3 -> dim channels with a fixed random
    projection. Shape contract of `DiTNVS.__call__`: (B, dim, gh, gw)."""
    h, w, _ = src_img.shape
    ph, pw = h // grid, w // grid
    pooled = src_img[:grid * ph, :grid * pw].reshape(
        grid, ph, grid, pw, 3).mean(axis=(1, 3))      # (g, g, 3)
    proj = np.random.RandomState(seed).randn(3, dim).astype(np.float32) * 0.5
    feat = pooled @ proj                               # (g, g, dim)
    return np.transpose(feat, (2, 0, 1))[None]         # (1, dim, g, g)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64,
                    help="scene/image side (pixels); DiT runs in image space")
    ap.add_argument("--num-sampling-steps", type=int, default=50)
    ap.add_argument("--nvs-model", action="store_true",
                    help="inpaint with the fork-variant DiTNVS (DINO "
                         "cross-attention on stub source features) instead "
                         "of the plain DiT")
    ap.add_argument("--ckpt", default=None,
                    help="optional orbax checkpoint dir with trained params "
                         "(default: random init — pipeline proof)")
    ap.add_argument("--jump-n", type=int, default=1,
                    help="RePaint resampling passes per step")
    ap.add_argument("--out-dir", default="nvs_demo_out")
    args = ap.parse_args()

    from fast_dit_tpu.utils.platform import maybe_force_cpu
    maybe_force_cpu()
    import jax
    import jax.numpy as jnp

    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.nvs import geometry, inpaint, metrics, warp
    from fast_dit_tpu.nvs.conditioning import DiTNVS
    from fast_dit_tpu.utils.image import save_image
    from fast_dit_tpu.utils.viz import depth_to_color, error_heatmap

    os.makedirs(args.out_dir, exist_ok=True)
    size = args.size

    # 1-2: scene + exact planar ground truth ------------------------------
    src, depth, K, (R1, t1), (R2, t2), d0 = make_scene(size)
    R_rel, t_rel = geometry.relative_pose(R1, t1, R2, t2)
    H = warp.homography_from_pose(K, K, R_rel, t_rel,
                                  plane_normal=jnp.array([0.0, 0.0, 1.0]),
                                  plane_distance=d0)
    gt, gt_mask = warp.warp_image_homography(jnp.asarray(src), H)
    gt = np.asarray(gt)

    # 3: depth-based forward warp (the hole-producing path) ----------------
    warped, cover = warp.warp_image_by_depth(
        jnp.asarray(src), jnp.asarray(depth), K, K, R_rel, t_rel)
    warped = np.asarray(warped)
    coverage = float(warp.valid_pixel_ratio(cover))

    # 4: hole mask exactly as the reference builds it ----------------------
    warped_u8 = np.clip(warped * 255, 0, 255).astype(np.uint8)
    holes = inpaint.mask_from_black_pixels(warped_u8)      # (H, W) bool

    # 5: diffusion inpainting ---------------------------------------------
    steps = args.num_sampling_steps
    diffusion = create_diffusion(str(steps),
                                 noise_schedule="squaredcos_cap_v2")
    known = jnp.asarray((warped.transpose(2, 0, 1)[None] * 2 - 1),
                        jnp.float32)                        # (1,3,H,W) [-1,1]
    mask = jnp.asarray(holes[None, None].astype(np.float32))
    rng = jax.random.PRNGKey(0)

    if args.nvs_model:
        dino_dim, dino_grid = 32, 4
        model = DiTNVS(input_size=size, patch_size=4, in_channels=3,
                       hidden_size=64, depth=4, num_heads=4, num_classes=1,
                       dino_dim=dino_dim, dino_patch_grid=dino_grid,
                       cross_layers=(1, 3), attn_backend="einsum")
        feat = jnp.asarray(make_stub_features(src, dino_grid, dino_dim))
        y = jnp.zeros((1,), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(1)},
                            jnp.zeros((1, 3, size, size)),
                            jnp.zeros((1,), jnp.int32), feat, y)
        model_fn = lambda p, x, t: model.apply(p, x, t, feat, y)
        model_name = "DiTNVS (stub DINO features, cross layers (1, 3))"
    else:
        model = DiT(input_size=size, patch_size=4, in_channels=3,
                    hidden_size=64, depth=4, num_heads=4, num_classes=1,
                    attn_backend="einsum")
        y = jnp.zeros((1,), jnp.int32)
        params = model.init({"params": jax.random.PRNGKey(1)},
                            jnp.zeros((1, 3, size, size)),
                            jnp.zeros((1,), jnp.int32), y)
        model_fn = lambda p, x, t: model.apply(p, x, t, y)
        model_name = "DiT (image-space)"
    if args.ckpt:
        from fast_dit_tpu.ckpt import restore_checkpoint
        restored = restore_checkpoint(args.ckpt)
        tree = restored["ema"] if "ema" in restored else restored["params"]
        params = jax.tree.map(jnp.asarray, tree)
    else:
        # random init: the zero-init adaLN/head makes the model output ~0;
        # perturb every leaf so the demo exercises a non-trivial network
        # (same device as sample.py --ckpt random)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
                      for p, k in zip(leaves, keys)])

    filled = jax.jit(lambda p, r: inpaint.inpaint_sample_loop(
        lambda x, t: model_fn(p, x, t), known, mask, diffusion.schedule,
        rng=r, clip_denoised=True, jump_n=args.jump_n))(params, rng)
    out = np.asarray(filled)[0].transpose(1, 2, 0) * 0.5 + 0.5
    out = np.clip(out, 0, 1)

    # 6: metrics + report --------------------------------------------------
    gt_u8 = np.clip(gt * 255, 0, 255).astype(np.uint8)
    out_u8 = np.clip(out * 255, 0, 255).astype(np.uint8)
    keep = ~holes & np.asarray(gt_mask)
    report = {
        "model": model_name,
        "steps": steps,
        "coverage": round(coverage, 4),
        "hole_fraction": round(float(holes.mean()), 4),
        "psnr_full": round(metrics.psnr(gt_u8, out_u8), 3),
        "ssim_full": round(metrics.ssim(gt_u8, out_u8), 4),
        # warp-path validation: outside the holes the depth warp must agree
        # with the exact homography (quantization-level error only)
        "psnr_warped_region": round(float(
            -10 * np.log10(np.maximum(
                np.mean((gt[keep] - warped[keep]) ** 2), 1e-12))), 3),
    }

    save_image(src.transpose(2, 0, 1)[None], f"{args.out_dir}/src.png",
               nrow=1, value_range=(0, 1))
    save_image(gt.transpose(2, 0, 1)[None], f"{args.out_dir}/gt_target.png",
               nrow=1, value_range=(0, 1))
    save_image(warped.transpose(2, 0, 1)[None],
               f"{args.out_dir}/warped_holes.png", nrow=1, value_range=(0, 1))
    save_image(out.transpose(2, 0, 1)[None],
               f"{args.out_dir}/inpainted.png", nrow=1, value_range=(0, 1))
    save_image(holes[None, None].astype(np.float32),
               f"{args.out_dir}/hole_mask.png", nrow=1, value_range=(0, 1))
    from PIL import Image
    Image.fromarray(depth_to_color(depth)).save(f"{args.out_dir}/depth.png")
    Image.fromarray(error_heatmap(gt_u8, out_u8)).save(
        f"{args.out_dir}/error_heatmap.png")

    with open(f"{args.out_dir}/report.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    ok = (np.isfinite(list(v for v in report.values()
                           if isinstance(v, float))).all()
          and report["psnr_warped_region"] > 25.0)
    print("NVS DEMO " + ("OK" if ok else "FAILED")
          + f" (outputs in {args.out_dir}/)")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
