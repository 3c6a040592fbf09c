"""Fused AdamW+EMA update vs the optax reference path.

Both lowerings of the fused update (`ops/fused_update.py`: the default
XLA single sweep and the use_pallas kernel) must be a pure speed change:
same math as optax.adamw(mu_dtype=bf16) wrapped in master weights +
update_ema (the bench/train mixed-precision configuration)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fast_dit_tpu.ops.fused_update import (FusedAdamWEmaState,
                                           fused_adamw_ema_apply,
                                           fused_adamw_ema_init)
from fast_dit_tpu.train.mixed_precision import masterize
from fast_dit_tpu.train.train_lib import update_ema

LR, EMA_D = 1e-3, 0.99


def make_tree(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 4)
    return {
        "big": jax.random.normal(ks[0], (4, 256, 512), jnp.bfloat16),  # kernel
        "mid": jax.random.normal(ks[1], (384,), jnp.bfloat16),         # kernel
        "odd": jax.random.normal(ks[2], (33,), jnp.bfloat16),          # XLA path
        "nested": {"w": jax.random.normal(ks[3], (128, 128), jnp.bfloat16)},
    }


def reference_step(params, ema, opt_state, tx, grads):
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    ema = update_ema(ema, opt_state.master, EMA_D)
    return params, ema, opt_state


@pytest.mark.parametrize("use_pallas", [False, True],
                         ids=["xla-sweep", "pallas-kernel"])
@pytest.mark.parametrize("steps", [1, 3])
def test_fused_matches_optax_reference(steps, use_pallas):
    params = make_tree()
    fused_state = fused_adamw_ema_init(params, mu_dtype=jnp.bfloat16)
    tx = masterize(optax.adamw(LR, weight_decay=0.0, mu_dtype=jnp.bfloat16))
    opt_state = tx.init(params)
    p_ref, p_fused = params, params
    ema_ref = jax.tree.map(lambda p: p.astype(jnp.float32), params)
    ema_fused = jax.tree.map(jnp.copy, ema_ref)

    for i in range(steps):
        grads = jax.tree.map(
            lambda p: jax.random.normal(jax.random.PRNGKey(100 + i), p.shape,
                                        p.dtype) * 0.1, params)
        p_ref, ema_ref, opt_state = reference_step(
            p_ref, ema_ref, opt_state, tx, grads)
        p_fused, fused_state, ema_fused = fused_adamw_ema_apply(
            fused_state, grads, p_fused, ema_fused, lr=LR, ema_decay=EMA_D,
            use_pallas=use_pallas)

    # tolerances: bf16 storage for params/mu; fp32 trees differ only by
    # op-ordering ulps (reciprocal-vs-divide bias correction, bf16 mu
    # promotion points) that compound to ~2e-5 over a few steps
    for name, a, b, rtol, atol in [
        ("params", p_fused, p_ref, 1e-2, 1e-2),
        ("ema", ema_fused, ema_ref, 1e-3, 1e-4),
        ("master", fused_state.master, opt_state.master, 1e-3, 1e-4),
        ("nu", fused_state.nu, opt_state.inner[0].nu, 1e-3, 1e-4),
        ("mu", fused_state.mu, opt_state.inner[0].mu, 1e-2, 1e-2),
    ]:
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(
                np.asarray(x, np.float32), np.asarray(y, np.float32),
                rtol=rtol, atol=atol, err_msg=name)
    assert int(fused_state.count) == steps


def test_fused_under_jit_with_donation():
    params = make_tree(1)
    state = fused_adamw_ema_init(params)
    ema = jax.tree.map(jnp.copy, state.master)

    @jax.jit
    def step(state, grads, params, ema):
        # exercise the Pallas kernel path under jit (the default XLA sweep
        # is covered by test_fused_matches_optax_reference)
        return fused_adamw_ema_apply(state, grads, params, ema,
                                     lr=LR, ema_decay=EMA_D, use_pallas=True)

    grads = jax.tree.map(lambda p: jnp.full(p.shape, 0.01, p.dtype), params)
    p2, s2, e2 = step(state, grads, params, ema)
    assert jax.tree.all(jax.tree.map(
        lambda a, b: a.shape == b.shape and a.dtype == b.dtype, p2, params))
    # a positive grad moves master down (minimization direction)
    assert float(jax.tree.leaves(s2.master)[0].mean()) < float(
        jax.tree.leaves(state.master)[0].mean())


def test_weight_decay_path():
    params = {"w": jnp.ones((256, 128), jnp.bfloat16)}
    state = fused_adamw_ema_init(params)
    ema = jax.tree.map(jnp.copy, state.master)
    grads = {"w": jnp.zeros((256, 128), jnp.bfloat16)}
    p2, s2, _ = fused_adamw_ema_apply(state, grads, params, ema,
                                      lr=0.1, weight_decay=0.5, ema_decay=0.9)
    # zero grads + weight decay: master shrinks by lr*wd*w
    np.testing.assert_allclose(np.asarray(s2.master["w"]),
                               1.0 - 0.1 * 0.5, rtol=1e-6)


def test_train_step_with_fused_optimizer():
    """End-to-end: make_train_step dispatches on FusedAdamWEmaState and the
    loss decreases over a few steps on a tiny DiT."""
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.train import create_train_state, make_train_step

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, dtype=jnp.bfloat16,
                attn_backend="einsum")
    schedule = create_diffusion("").schedule
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   fused_optimizer=True)
    assert tx is None and isinstance(state.opt_state, FusedAdamWEmaState)
    step = jax.jit(make_train_step(model, schedule, None, lr=1e-3),
                   donate_argnums=(0,))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)}
    losses = []
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)) and int(state.step) == 3
    assert int(state.opt_state.count) == 3


# ---------------------------------------------------------------------------
# shrunken second-moment state (round 4: the memory lever for selective remat)
# ---------------------------------------------------------------------------

from fast_dit_tpu.ops.fused_update import FactoredNu


def test_factored_nu_state_layout():
    """Leaves >= the size floor with >=2 non-trivial trailing dims get a
    rank-1 FactoredNu; small/1D leaves keep a dense nu."""
    params = make_tree()
    state = fused_adamw_ema_init(params, factored=True)
    nu = state.nu
    assert isinstance(nu["big"], FactoredNu)          # (4,256,512) factored
    assert nu["big"].row.shape == (4, 256)
    assert nu["big"].col.shape == (4, 512)
    assert not isinstance(nu["mid"], FactoredNu)      # 1D -> dense
    assert not isinstance(nu["odd"], FactoredNu)
    assert not isinstance(nu["nested"]["w"], FactoredNu)  # 16K < floor
    dense = sum(l.size for l in jax.tree.leaves(
        fused_adamw_ema_init(params).nu))
    small = sum(jnp.size(l) for l in jax.tree.leaves(nu))
    assert small < dense / 3  # the big leaf dominates; its nu is ~rank-1 now


def test_factored_exact_on_rank1_sq_grads():
    """Adafactor's reconstruction v_ij = row_i*col_j/mean(row) is EXACT when
    g^2 is rank-1 (Shazeer & Stern eq. 4): with constant outer-product grads
    the factored update must track the dense update to fp tolerance."""
    a = jnp.linspace(0.5, 2.0, 256)
    b = jnp.linspace(0.1, 1.0, 512)
    g = jnp.outer(a, b).astype(jnp.float32)  # g^2 = outer(a^2, b^2): rank 1
    params = {"w": jnp.ones((256, 512), jnp.float32)}
    grads = {"w": g}
    s_dense = fused_adamw_ema_init(params, mu_dtype=jnp.float32)
    s_fact = fused_adamw_ema_init(params, mu_dtype=jnp.float32, factored=True)
    ema_d = jax.tree.map(jnp.copy, s_dense.master)
    ema_f = jax.tree.map(jnp.copy, s_fact.master)
    p_d = p_f = params
    for _ in range(4):
        p_d, s_dense, ema_d = fused_adamw_ema_apply(
            s_dense, grads, p_d, ema_d, lr=LR, ema_decay=EMA_D)
        p_f, s_fact, ema_f = fused_adamw_ema_apply(
            s_fact, grads, p_f, ema_f, lr=LR, ema_decay=EMA_D)
    np.testing.assert_allclose(np.asarray(s_fact.master["w"]),
                               np.asarray(s_dense.master["w"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ema_f["w"]), np.asarray(ema_d["w"]),
                               rtol=1e-5, atol=1e-6)


def test_factored_under_jit_with_donation():
    params = make_tree(2)
    state = fused_adamw_ema_init(params, factored=True)
    ema = jax.tree.map(jnp.copy, state.master)

    @jax.jit
    def step(state, grads, params, ema):
        return fused_adamw_ema_apply(state, grads, params, ema,
                                     lr=LR, ema_decay=EMA_D)

    grads = jax.tree.map(lambda p: jnp.full(p.shape, 0.01, p.dtype), params)
    p2, s2, e2 = step(state, grads, params, ema)
    assert isinstance(s2.nu["big"], FactoredNu)
    assert s2.nu["big"].row.shape == state.nu["big"].row.shape
    assert float(jax.tree.leaves(s2.master)[0].mean()) < float(
        jax.tree.leaves(state.master)[0].mean())
    # a second step from the returned state (structure round-trips)
    p3, s3, e3 = step(s2, grads, p2, e2)
    assert int(s3.count) == 2


def test_bf16_nu_close_to_fp32_first_step():
    """bf16 nu storage: math still runs in fp32, storage rounds to bf16 —
    one step from zero must agree with fp32 nu to bf16 resolution."""
    params = make_tree(3)
    s32 = fused_adamw_ema_init(params)
    s16 = fused_adamw_ema_init(params, nu_dtype=jnp.bfloat16)
    assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(s16.nu))
    ema32 = jax.tree.map(jnp.copy, s32.master)
    ema16 = jax.tree.map(jnp.copy, s16.master)
    grads = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(7), p.shape,
                                    jnp.float32) * 0.1, params)
    p32, s32, _ = fused_adamw_ema_apply(s32, grads, params, ema32,
                                        lr=LR, ema_decay=EMA_D)
    p16, s16, _ = fused_adamw_ema_apply(s16, grads, params, ema16,
                                        lr=LR, ema_decay=EMA_D)
    for x, y in zip(jax.tree.leaves(s16.master), jax.tree.leaves(s32.master)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-2, atol=1e-5)


def test_train_step_with_factored_optimizer():
    """End-to-end tiny DiT with the factored second moment: finite losses,
    count advances, and the checkpoint tree round-trips through jit."""
    from fast_dit_tpu.diffusion import create_diffusion
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.train import create_train_state, make_train_step

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, dtype=jnp.bfloat16,
                attn_backend="einsum")
    schedule = create_diffusion("").schedule
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   fused_optimizer=True, factored_nu=True)
    assert tx is None and isinstance(state.opt_state, FusedAdamWEmaState)
    step = jax.jit(make_train_step(model, schedule, None, lr=1e-3),
                   donate_argnums=(0,))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 8, 8)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)}
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)) and int(state.opt_state.count) == 3


def test_factored_nu_requires_fused_optimizer():
    from fast_dit_tpu.models import DiT
    from fast_dit_tpu.train import create_train_state

    model = DiT(input_size=8, patch_size=4, in_channels=4, hidden_size=32,
                depth=1, num_heads=4, num_classes=10, attn_backend="einsum")
    with pytest.raises(ValueError, match="fused"):
        create_train_state(model, jax.random.PRNGKey(0), factored_nu=True)
