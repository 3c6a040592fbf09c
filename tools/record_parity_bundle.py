"""Record a latent-parity bundle FROM THE REFERENCE IMPLEMENTATION.

Drives the reference's own `SpacedDiffusion.p_sample_loop` /
`ddim_sample_loop` (/root/reference/diffusion — pure torch+numpy, runs on
CPU) over the functional-torch DiT oracle, capturing the injected noise
stream, and writes the bundle `tools/parity_check.py` consumes:
`{x_T, step_noise, y, expected}` npz plus the matching `.pt` state dict.

The committed fixtures under tests/fixtures/ were produced by:
    python tools/record_parity_bundle.py --out tests/fixtures
so the fidelity pin is backed by the reference's code, not a numpy
re-implementation (tests/test_parity_harness.py replays them).
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)
sys.path.insert(0, REFERENCE)

import numpy as np  # noqa: E402
import torch  # noqa: E402

from diffusion import create_diffusion as ref_create_diffusion  # noqa: E402

from tests.test_ckpt_import import (  # noqa: E402
    C,
    DEPTH,
    HEADS,
    IMG,
    NCLS,
    P,
    make_state_dict,
    torch_oracle_forward,
)

T = 10
SCHEDULE = "squaredcos_cap_v2"  # valid at any T (Ho linear needs T >= 50)


def record(sampler: str, out_dir: str, seed: int = 7) -> dict:
    sd = make_state_dict(seed=0)
    rs = np.random.RandomState(seed)
    B = 2
    x_T = rs.randn(B, C, IMG, IMG).astype(np.float32)
    y = np.array([1, 7], np.int64)
    step_noise = rs.randn(T, B, C, IMG, IMG).astype(np.float32)

    # replay the pre-drawn stream through the reference's th.randn_like
    state = {"k": 0}
    real_randn_like = torch.randn_like

    def replay_randn_like(x, **kwargs):
        n = torch.from_numpy(step_noise[state["k"]])
        state["k"] += 1
        return n

    torch.randn_like = replay_randn_like
    try:
        ref = ref_create_diffusion(
            str(T) if sampler == "ddpm" else f"ddim{T}",
            noise_schedule=SCHEDULE, diffusion_steps=T)

        def model(x, t, **kwargs):
            return torch.from_numpy(
                torch_oracle_forward(sd, x.numpy(), t.numpy(), y))

        loop = ref.p_sample_loop if sampler == "ddpm" else ref.ddim_sample_loop
        expected = loop(model, x_T.shape, noise=torch.from_numpy(x_T),
                        clip_denoised=True, device="cpu").numpy()
    finally:
        torch.randn_like = real_randn_like
    if sampler == "ddpm":
        assert state["k"] == T, f"expected {T} noise draws, saw {state['k']}"

    os.makedirs(out_dir, exist_ok=True)
    bundle = os.path.join(out_dir, f"ref_bundle_{sampler}_T{T}.npz")
    np.savez(bundle, x_T=x_T, step_noise=step_noise, y=y, expected=expected)
    ckpt = os.path.join(out_dir, "ref_bundle_model.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ckpt)
    meta = {
        "sampler": sampler, "T": T, "schedule": SCHEDULE,
        "clip_denoised": True,
        "model_config": dict(input_size=IMG, patch_size=P, in_channels=C,
                             hidden_size=32, depth=DEPTH, num_heads=HEADS,
                             num_classes=NCLS, attn_backend="xla"),
    }
    with open(os.path.join(out_dir, f"ref_bundle_{sampler}_T{T}.json"), "w") as f:
        json.dump(meta, f, indent=1)
    print(f"recorded {bundle} (expected latents std={expected.std():.4f})")
    return meta


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "tests/fixtures"))
    args = ap.parse_args()
    record("ddpm", args.out)
    record("ddim", args.out)
