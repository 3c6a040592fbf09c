"""fp32 fixed-seed latent-parity harness (the BASELINE.json fidelity pin).

Given a parity bundle recorded from the reference implementation —
an npz with `x_T` (initial noise, (B, 4, h, w)), `step_noise`
((T, B, 4, h, w), the per-step Gaussian draws in loop order t = T-1..0),
`y` (labels), and `expected` (the reference's final latents) — replays the
exact noise stream through our scan sampler with the given checkpoint and
reports max/mean absolute deviation. Because torch and JAX RNGs cannot be
matched from seeds alone (SURVEY.md §7), the noise is injected, which
`p_sample_loop(noise=..., step_noise=...)` supports bit-for-bit.

Recording on the reference side: wrap its model with a hook capturing
`th.randn` draws inside `p_sample`, or pre-generate the noise and pass it
through `p_sample_loop(noise=...)` there as well.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bundle", required=True, help="npz with x_T, step_noise, y, expected")
    ap.add_argument("--ckpt", required=True, help=".pt checkpoint path or pretrained name")
    ap.add_argument("--model", default="DiT-XL/2")
    ap.add_argument("--image-size", type=int, default=256)
    ap.add_argument("--cfg-scale", type=float, default=0.0,
                    help="0 disables CFG; >1 uses forward_with_cfg (bundle's "
                         "x_T/y must then be the doubled batch)")
    ap.add_argument("--sampler", default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--model-config", default=None,
                    help="JSON kwargs for a custom DiT config "
                         "(overrides --model; for test fixtures)")
    ap.add_argument("--diffusion-steps", type=int, default=1000,
                    help="original process length (respaced down to the "
                         "bundle's step count)")
    ap.add_argument("--noise-schedule", default="linear",
                    choices=["linear", "squaredcos_cap_v2"])
    ap.add_argument("--clip-denoised", action="store_true",
                    help="clip x0 predictions to [-1,1] (keeps untrained-"
                         "model chaos bounded; the reference's latent "
                         "sampling uses clip_denoised=False)")
    ap.add_argument("--rtol", type=float, default=0.0,
                    help="additional relative tolerance: pass if "
                         "max|Δ| <= atol + rtol * max|expected|")
    args = ap.parse_args()

    import jax

    from fast_dit_tpu.utils.platform import maybe_force_cpu

    maybe_force_cpu()
    # parity is a numerics tool: always use full-precision MXU passes
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from fast_dit_tpu.ckpt import find_model, state_dict_to_flax
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT_models

    bundle = np.load(args.bundle)
    x_T = jnp.asarray(bundle["x_T"])
    step_noise = jnp.asarray(bundle["step_noise"])
    y = jnp.asarray(bundle["y"])
    expected = np.asarray(bundle["expected"])
    T = step_noise.shape[0]

    if args.model_config:
        import json

        from fast_dit_tpu.models import DiT

        model = DiT(**json.loads(args.model_config))
    else:
        model = DiT_models[args.model](input_size=args.image_size // 8,
                                       attn_backend="pallas")  # high-precision path
    sd = find_model(args.ckpt)
    params = jax.tree.map(jnp.asarray,
                          state_dict_to_flax(sd, model.depth, model.num_heads))
    diffusion = create_diffusion(str(T) if args.sampler == "ddpm" else f"ddim{T}",
                                 diffusion_steps=args.diffusion_steps,
                                 noise_schedule=args.noise_schedule)

    if args.cfg_scale > 1.0:
        model_fn = lambda x, t: model.apply(params, x, t, y,
                                            method=model.forward_with_cfg,
                                            cfg_scale=args.cfg_scale)
    else:
        model_fn = lambda x, t: model.apply(params, x, t, y)

    loop = (diffusion.p_sample_loop if args.sampler == "ddpm"
            else diffusion.ddim_sample_loop)
    got = np.asarray(loop(model_fn, x_T.shape, noise=x_T, step_noise=step_noise,
                          clip_denoised=args.clip_denoised))

    diff = np.abs(got - expected)
    bound = args.atol + args.rtol * np.abs(expected).max()
    print(f"latent parity: max|Δ|={diff.max():.3e} mean|Δ|={diff.mean():.3e} "
          f"(bound {bound:.3e})")
    if diff.max() <= bound:
        print("PARITY OK")
    else:
        print("PARITY FAILED")
        sys.exit(1)


if __name__ == "__main__":
    main()
