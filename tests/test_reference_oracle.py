"""Parity against the LITERAL reference implementation.

`/root/reference/diffusion/` is pure torch+numpy and runs in this
environment, so the L1 diffusion layer is pinned directly to the reference's
own code (not a re-implementation): fp64 schedule tables, the respacing DSL,
`training_losses` across every mean/var/loss configuration, `_vb_terms_bpd`,
and the full `p_sample_loop` / `ddim_sample_loop` chains with an injected
noise stream and a shared analytic model.

The reference package is imported read-only from /root/reference (its
`diffusion/` subpackage has no torch-GPU or timm dependency).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from diffusion import create_diffusion as ref_create_diffusion  # noqa: E402
from diffusion import gaussian_diffusion as ref_gd  # noqa: E402
from diffusion.respace import space_timesteps as ref_space_timesteps  # noqa: E402

from fast_dit_tpu.diffusion import (  # noqa: E402
    DiffusionSchedule,
    create_diffusion,
    get_named_beta_schedule,
    space_timesteps,
)
from fast_dit_tpu.diffusion.gaussian import vb_terms_bpd  # noqa: E402

# ---------------------------------------------------------------------------
# shared analytic model: smooth, bounded, implemented identically in torch
# and jax so both loss/sampler stacks see the same function of (x, t)
# ---------------------------------------------------------------------------


def torch_model(learn_sigma):
    def f(x, t, **kwargs):
        a = torch.cos(0.013 * t.float() + 0.7)[:, None, None, None]
        eps = 0.3 * x * a + 0.1 * torch.sin(2.0 * x)
        if not learn_sigma:
            return eps
        v = torch.tanh(0.5 * x)
        return torch.cat([eps, v], dim=1)

    return f


def jax_model(learn_sigma):
    def f(x, t):
        a = jnp.cos(0.013 * t.astype(jnp.float32) + 0.7)[:, None, None, None]
        eps = 0.3 * x * a + 0.1 * jnp.sin(2.0 * x)
        if not learn_sigma:
            return eps
        v = jnp.tanh(0.5 * x)
        return jnp.concatenate([eps, v], axis=1)

    return f


def make_inputs(B=4, C=2, HW=8, seed=0):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, C, HW, HW).astype(np.float32) * 0.7
    noise = rs.randn(B, C, HW, HW).astype(np.float32)
    return x, noise


# ---------------------------------------------------------------------------
# fp64 tables
# ---------------------------------------------------------------------------

TABLE_KEYS = [
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "alphas_cumprod_next",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
]


@pytest.mark.parametrize("schedule_name", ["linear", "squaredcos_cap_v2"])
@pytest.mark.parametrize("respacing", ["", "250", "ddim25", "10,15,20"])
def test_fp64_tables_match_reference(schedule_name, respacing):
    ref = ref_create_diffusion(respacing, noise_schedule=schedule_name)
    betas = get_named_beta_schedule(schedule_name, 1000)
    use = space_timesteps(1000, respacing or [1000])
    tabs = DiffusionSchedule.create_fp64_tables(betas, use_timesteps=use)
    for key in TABLE_KEYS:
        np.testing.assert_allclose(
            tabs[key], getattr(ref, key), rtol=1e-12, atol=1e-300, err_msg=key)


def test_betas_match_reference_all_named_schedules():
    for name in ("linear", "squaredcos_cap_v2"):
        for T in (50, 100, 1000, 4000):
            np.testing.assert_allclose(
                get_named_beta_schedule(name, T),
                ref_gd.get_named_beta_schedule(name, T), rtol=1e-14,
                err_msg=f"{name}/{T}")


# ---------------------------------------------------------------------------
# respacing DSL
# ---------------------------------------------------------------------------


def test_space_timesteps_matches_reference_corpus():
    corpus = [
        (1000, "ddim25"), (1000, "ddim50"), (1000, "ddim100"), (1000, "ddim250"),
        (1000, "250"), (1000, "100"), (1000, "1000"), (1000, "1"),
        (1000, "25,25,50"), (1000, "10,15,20"), (100, "10"), (123, "7,11,13"),
        (1000, [250]), (1000, [10, 15, 20]), (37, "37"),
    ]
    for T, spec in corpus:
        assert space_timesteps(T, spec) == ref_space_timesteps(T, spec), (T, spec)


def test_space_timesteps_randomized_vs_reference():
    rs = np.random.RandomState(3)
    for _ in range(200):
        T = int(rs.randint(10, 2000))
        n_sections = int(rs.randint(1, 4))
        per = T // n_sections
        counts = [int(rs.randint(1, max(2, per))) for _ in range(n_sections)]
        spec = ",".join(str(c) for c in counts)
        assert space_timesteps(T, spec) == ref_space_timesteps(T, spec), (T, spec)


# ---------------------------------------------------------------------------
# training losses, every mean/var/loss configuration the factory can build
# ---------------------------------------------------------------------------

FACTORY_CONFIGS = [
    # (kwargs, learn_sigma) — learn_sigma decides the model output arity
    (dict(), True),                                        # MSE + LEARNED_RANGE
    (dict(rescale_learned_sigmas=True), True),             # RESCALED_MSE
    (dict(use_kl=True), True),                             # RESCALED_KL
    (dict(learn_sigma=False), False),                      # MSE + FIXED_LARGE
    (dict(learn_sigma=False, sigma_small=True), False),    # MSE + FIXED_SMALL
    (dict(predict_xstart=True), True),                     # START_X target
    (dict(predict_xstart=True, learn_sigma=False), False),
]


@pytest.mark.parametrize("respacing", ["", "100"])
@pytest.mark.parametrize("cfg_idx", range(len(FACTORY_CONFIGS)))
def test_training_losses_match_reference(cfg_idx, respacing):
    kwargs, learn_sigma = FACTORY_CONFIGS[cfg_idx]
    kwargs = dict(kwargs, learn_sigma=learn_sigma)
    ref = ref_create_diffusion(respacing, **kwargs)
    ours = create_diffusion(respacing, **kwargs)
    assert ours.num_timesteps == ref.num_timesteps

    x, noise = make_inputs()
    T = ref.num_timesteps
    t = np.array([0, 1, T // 2, T - 1], np.int64)

    ref_terms = ref.training_losses(
        torch_model(learn_sigma), torch.from_numpy(x), torch.from_numpy(t),
        noise=torch.from_numpy(noise))
    our_terms = ours.training_losses(
        jax_model(learn_sigma), jnp.asarray(x), jnp.asarray(t),
        noise=jnp.asarray(noise))

    assert set(our_terms) >= {k for k in ref_terms}, (our_terms.keys(), ref_terms.keys())
    for key, ref_val in ref_terms.items():
        ours_v, ref_v = np.asarray(our_terms[key]), ref_val.numpy()
        # the t == 0 VLB entry is the discretized decoder NLL, whose fp32
        # conditioning is ~1/sigma in the variance tail — compare it looser
        rtol = np.where(t == 0, 1e-2, 2e-4)
        assert (np.abs(ours_v - ref_v) <= rtol * np.abs(ref_v) + 1e-5).all(), (
            f"term {key} cfg {kwargs} respacing '{respacing}': "
            f"ours={ours_v} ref={ref_v}")


# ---------------------------------------------------------------------------
# VLB term (covers p_mean_variance + discretized decoder NLL, incl. t == 0)
# ---------------------------------------------------------------------------


def test_vb_terms_bpd_matches_reference():
    ref = ref_create_diffusion("")  # LEARNED_RANGE, 1000 steps
    ours = create_diffusion("")
    x, noise = make_inputs(B=6)
    t = np.array([0, 0, 1, 17, 500, 999], np.int64)
    x_t = np.asarray(ours.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise)))

    ref_out = ref._vb_terms_bpd(
        torch_model(True), torch.from_numpy(x), torch.from_numpy(x_t),
        torch.from_numpy(t), clip_denoised=False)
    model_output = jax_model(True)(jnp.asarray(x_t), jnp.asarray(t))
    our_vb, our_x0 = vb_terms_bpd(
        ours.schedule, model_output, jnp.asarray(x), jnp.asarray(x_t),
        jnp.asarray(t), clip_denoised=False)

    np.testing.assert_allclose(np.asarray(our_vb), ref_out["output"].numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_x0), ref_out["pred_xstart"].numpy(),
                               rtol=2e-4, atol=1e-5)


def test_q_sample_and_posterior_match_reference():
    ref = ref_create_diffusion("250")
    ours = create_diffusion("250")
    x, noise = make_inputs(B=4)
    t = np.array([0, 3, 100, 249], np.int64)
    ref_xt = ref.q_sample(torch.from_numpy(x), torch.from_numpy(t),
                          noise=torch.from_numpy(noise)).numpy()
    our_xt = np.asarray(ours.q_sample(jnp.asarray(x), jnp.asarray(t), jnp.asarray(noise)))
    np.testing.assert_allclose(our_xt, ref_xt, rtol=1e-6, atol=1e-6)

    ref_mean, ref_var, ref_logvar = ref.q_posterior_mean_variance(
        torch.from_numpy(x), torch.from_numpy(ref_xt), torch.from_numpy(t))
    our_mean, our_var, our_logvar = ours.q_posterior_mean_variance(
        jnp.asarray(x), jnp.asarray(our_xt), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(our_mean), ref_mean.numpy(), rtol=1e-5, atol=1e-6)
    # the reference broadcasts var/logvar to x's full shape; ours keeps the
    # per-example (B,1,1,1) column — broadcast before comparing values
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(our_var), ref_var.shape), ref_var.numpy(),
        rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(our_logvar), ref_logvar.shape),
        ref_logvar.numpy(), rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# full sampler chains with an injected noise stream
# ---------------------------------------------------------------------------


def _patched_randn_stream(monkeypatch, noises):
    """Make torch.randn_like replay a fixed stream (reference p_sample calls
    it exactly once per step, t = T-1 .. 0)."""
    state = {"k": 0}

    def fake_randn_like(x, **kwargs):
        n = torch.from_numpy(noises[state["k"]])
        state["k"] += 1
        assert n.shape == x.shape
        return n

    monkeypatch.setattr(torch, "randn_like", fake_randn_like)
    return state


@pytest.mark.parametrize("learn_sigma", [True, False])
def test_p_sample_loop_matches_reference(monkeypatch, learn_sigma):
    T = 25
    ref = ref_create_diffusion(str(T), learn_sigma=learn_sigma)
    ours = create_diffusion(str(T), learn_sigma=learn_sigma)

    rs = np.random.RandomState(11)
    shape = (2, 2, 8, 8)
    x_T = rs.randn(*shape).astype(np.float32)
    step_noise = rs.randn(T, *shape).astype(np.float32)

    state = _patched_randn_stream(monkeypatch, step_noise)
    ref_out = ref.p_sample_loop(
        torch_model(learn_sigma), shape, noise=torch.from_numpy(x_T),
        clip_denoised=True, device="cpu").numpy()
    assert state["k"] == T  # one draw per step, in loop order

    our_out = np.asarray(ours.p_sample_loop(
        jax_model(learn_sigma), shape, noise=jnp.asarray(x_T),
        step_noise=jnp.asarray(step_noise), clip_denoised=True))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=5e-4)


@pytest.mark.parametrize("respacing,eta", [("ddim25", 0.0), ("ddim50", 0.0),
                                           ("ddim25", 0.5)])
def test_ddim_sample_loop_matches_reference(monkeypatch, respacing, eta):
    ref = ref_create_diffusion(respacing)
    ours = create_diffusion(respacing)
    T = ref.num_timesteps

    rs = np.random.RandomState(13)
    shape = (2, 2, 8, 8)
    x_T = rs.randn(*shape).astype(np.float32)
    step_noise = rs.randn(T, *shape).astype(np.float32)

    _patched_randn_stream(monkeypatch, step_noise)
    ref_out = ref.ddim_sample_loop(
        torch_model(True), shape, noise=torch.from_numpy(x_T),
        clip_denoised=True, eta=eta, device="cpu").numpy()

    our_out = np.asarray(ours.ddim_sample_loop(
        jax_model(True), shape, noise=jnp.asarray(x_T),
        step_noise=jnp.asarray(step_noise), clip_denoised=True, eta=eta))
    np.testing.assert_allclose(our_out, ref_out, rtol=1e-3, atol=5e-4)


def test_model_sees_original_timesteps_like_reference(monkeypatch):
    """Under respacing both stacks must feed the model ORIGINAL-process
    timesteps (reference respace.py:117-129 `_WrappedModel`)."""
    T = 10
    ref = ref_create_diffusion(str(T))
    ours = create_diffusion(str(T))
    seen_ref, seen_ours = [], []

    def ref_m(x, t, **kw):
        seen_ref.append(int(t[0]))
        return torch_model(True)(x, t)

    def our_m(x, t):
        jax.debug.callback(lambda tv: seen_ours.append(int(tv[0])), t)
        return jax_model(True)(x, t)

    shape = (1, 2, 8, 8)
    rs = np.random.RandomState(0)
    x_T = rs.randn(*shape).astype(np.float32)
    step_noise = rs.randn(T, *shape).astype(np.float32)
    _patched_randn_stream(monkeypatch, step_noise)
    ref.p_sample_loop(ref_m, shape, noise=torch.from_numpy(x_T), device="cpu")
    with jax.disable_jit():
        ours.p_sample_loop(our_m, shape, noise=jnp.asarray(x_T),
                           step_noise=jnp.asarray(step_noise))
    assert seen_ref == seen_ours
    assert seen_ref == sorted(seen_ref, reverse=True)
    assert max(seen_ref) > T  # original-process indices, not respaced ones
