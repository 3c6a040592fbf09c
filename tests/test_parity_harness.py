"""Cross-implementation latent parity: torch-oracle model + independent
numpy DDPM loop vs our flax model + scan sampler, sharing one injected noise
stream — the end-to-end version of the BASELINE fidelity pin, exercised
through tools/parity_check.py."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

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
from fast_dit_tpu.diffusion import DiffusionSchedule, get_named_beta_schedule  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
T = 10
SCHEDULE = "squaredcos_cap_v2"  # valid at any T (linear needs T >= 50)
# The harness forces CPU + highest matmul precision: an untrained random
# model amplifies backend precision differences ~3-5x per step, so default
# bf16 MXU passes would swamp the comparison.


def numpy_ddpm_loop(sd, x_T, step_noise, y):
    """Independent fp64-table numpy DDPM sampler over the torch oracle."""
    tabs = DiffusionSchedule.create_fp64_tables(get_named_beta_schedule(SCHEDULE, T))
    x = np.asarray(x_T, np.float32)
    B = x.shape[0]
    for k, i in enumerate(range(T - 1, -1, -1)):
        t = np.full((B,), i, np.int64)
        out = torch_oracle_forward(sd, x, t, np.asarray(y, np.int64))
        eps, v = out[:, :C], out[:, C:]
        # LEARNED_RANGE variance interpolation
        min_log = np.float32(tabs["posterior_log_variance_clipped"][i])
        max_log = np.float32(np.log(tabs["betas"][i]))
        frac = (v + 1) / 2
        log_var = frac * max_log + (1 - frac) * min_log
        # epsilon -> x0 (clipped) -> posterior mean
        x0 = (np.float32(tabs["sqrt_recip_alphas_cumprod"][i]) * x
              - np.float32(tabs["sqrt_recipm1_alphas_cumprod"][i]) * eps)
        x0 = np.clip(x0, -1.0, 1.0)  # bound untrained-model chaos
        mean = (np.float32(tabs["posterior_mean_coef1"][i]) * x0
                + np.float32(tabs["posterior_mean_coef2"][i]) * x)
        mask = 0.0 if i == 0 else 1.0
        x = mean + mask * np.exp(0.5 * log_var) * np.asarray(step_noise[k], np.float32)
    return x


def test_parity_harness_end_to_end(tmp_path):
    sd = make_state_dict(seed=0)
    rs = np.random.RandomState(7)
    B = 2
    x_T = rs.randn(B, C, IMG, IMG).astype(np.float32)
    step_noise = rs.randn(T, B, C, IMG, IMG).astype(np.float32)
    y = np.array([1, 7], np.int64)
    expected = numpy_ddpm_loop(sd, x_T, step_noise, y)
    assert np.isfinite(expected).all()

    bundle = str(tmp_path / "bundle.npz")
    np.savez(bundle, x_T=x_T, step_noise=step_noise, y=y, expected=expected)
    ckpt = str(tmp_path / "model.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ckpt)

    cfg = dict(input_size=IMG, patch_size=P, in_channels=C, hidden_size=32,
               depth=DEPTH, num_heads=HEADS, num_classes=NCLS,
               attn_backend="xla")
    env = dict(os.environ, FDT_FORCE_CPU="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/parity_check.py"),
         "--bundle", bundle, "--ckpt", ckpt,
         "--model-config", json.dumps(cfg), "--atol", "2e-4",
         "--diffusion-steps", str(T), "--noise-schedule", SCHEDULE,
         "--clip-denoised"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PARITY OK" in r.stdout, r.stdout


@pytest.mark.parametrize("sampler", ["ddpm", "ddim"])
def test_parity_against_recorded_reference_bundle(sampler):
    """Replay the COMMITTED bundle recorded from the reference's own
    p_sample_loop/ddim_sample_loop (tools/record_parity_bundle.py) — the
    fidelity pin backed by /root/reference's code, not a re-implementation."""
    fixtures = os.path.join(REPO, "tests/fixtures")
    meta_path = os.path.join(fixtures, f"ref_bundle_{sampler}_T10.json")
    with open(meta_path) as f:
        meta = json.load(f)
    env = dict(os.environ, FDT_FORCE_CPU="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/parity_check.py"),
         "--bundle", os.path.join(fixtures, f"ref_bundle_{sampler}_T10.npz"),
         "--ckpt", os.path.join(fixtures, "ref_bundle_model.pt"),
         "--model-config", json.dumps(meta["model_config"]),
         "--sampler", sampler, "--atol", "2e-4",
         "--diffusion-steps", str(meta["T"]),
         "--noise-schedule", meta["schedule"], "--clip-denoised"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "PARITY OK" in r.stdout, r.stdout


def test_parity_harness_detects_mismatch(tmp_path):
    sd = make_state_dict(seed=0)
    rs = np.random.RandomState(7)
    x_T = rs.randn(1, C, IMG, IMG).astype(np.float32)
    step_noise = rs.randn(T, 1, C, IMG, IMG).astype(np.float32)
    y = np.array([1], np.int64)
    bundle = str(tmp_path / "bundle.npz")
    np.savez(bundle, x_T=x_T, step_noise=step_noise, y=y,
             expected=np.zeros_like(x_T))  # wrong on purpose
    ckpt = str(tmp_path / "model.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}, ckpt)
    cfg = dict(input_size=IMG, patch_size=P, in_channels=C, hidden_size=32,
               depth=DEPTH, num_heads=HEADS, num_classes=NCLS,
               attn_backend="xla")
    env = dict(os.environ, FDT_FORCE_CPU="1", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/parity_check.py"),
         "--bundle", bundle, "--ckpt", ckpt,
         "--model-config", json.dumps(cfg), "--diffusion-steps", str(T), "--noise-schedule", SCHEDULE,
         "--clip-denoised"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 1
    assert "PARITY FAILED" in r.stdout
