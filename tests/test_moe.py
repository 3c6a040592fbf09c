"""Mixture-of-Experts DiT (models/moe.py) + expert parallelism.

Beyond-parity capability (the reference has no MoE family): the routed
expert MLP must be a strict superset of the dense block (E=1 == Mlp
exactly), keep the router balanced at init, drop overflow tokens cleanly,
train end-to-end with its aux losses, and shard its expert axis over a
('data', 'expert') mesh without changing the math.
"""

import jax
import jax.numpy as jnp
import pytest

from fast_dit_tpu.diffusion import DiffusionSchedule, get_named_beta_schedule
from fast_dit_tpu.models import DiT, DiT_models
from fast_dit_tpu.models.layers import Mlp
from fast_dit_tpu.models.moe import MoeMlp, expert_capacity
from fast_dit_tpu.parallel import batch_sharding
from fast_dit_tpu.parallel.mesh import create_expert_mesh, param_shardings
from fast_dit_tpu.train import create_train_state, make_sharded_train_step, make_train_step


def _moe_dit(**kw):
    cfg = dict(input_size=16, patch_size=4, in_channels=4, hidden_size=64,
               depth=2, num_heads=4, num_classes=10, attn_backend="xla",
               moe_experts=4, moe_top_k=2)
    cfg.update(kw)
    return DiT(**cfg)


def test_single_expert_equals_dense_mlp():
    """MoeMlp(E=1, k=1, ample capacity) is EXACTLY the dense Mlp: the gate
    softmax over one expert is 1.0 and nothing is dropped."""
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 32))
    moe = MoeMlp(1, 64, 32, top_k=1, capacity_factor=2.0)
    mv = moe.init(jax.random.PRNGKey(7), x)
    dv = {"params": {
        "fc1": {"kernel": mv["params"]["wi"][0], "bias": mv["params"]["bi"][0]},
        "fc2": {"kernel": mv["params"]["wo"][0], "bias": mv["params"]["bo"][0]},
    }}
    got = moe.apply(mv, x)
    want = Mlp(64, 32).apply(dv, x)
    assert jnp.abs(got - want).max() < 1e-5


def test_capacity_overflow_drops_tokens():
    """With capacity 1 slot/expert most tokens overflow: their MLP
    contribution must be zero (not garbage), never NaN."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 16))
    moe = MoeMlp(2, 32, 16, top_k=1, capacity_factor=2.0 / 32)
    assert expert_capacity(32, 2, 1, 2.0 / 32) == 1
    v = moe.init(jax.random.PRNGKey(1), x)
    y = moe.apply(v, x)
    assert jnp.all(jnp.isfinite(y))
    # at most 2 tokens (1 per expert) have nonzero output
    nonzero = jnp.sum(jnp.any(jnp.abs(y[0]) > 0, axis=-1))
    assert int(nonzero) <= 2


def test_moe_dit_init_has_only_params():
    """model.init must NOT leak the sown 'losses' collection into the
    variables used as the optimizer state."""
    m = _moe_dit()
    x = jnp.zeros((1, 4, 16, 16))
    v = m.init({"params": jax.random.PRNGKey(0)}, x,
               jnp.zeros((1,), jnp.int32), jnp.zeros((1,), jnp.int32))
    assert set(v.keys()) == {"params"}


def test_moe_train_step_router_gets_gradients():
    m = _moe_dit(remat=True)
    sched = DiffusionSchedule.create(get_named_beta_schedule("linear", 100))
    state, tx = create_train_state(m, jax.random.PRNGKey(0))
    # snapshot to host BEFORE the step: donate_argnums deletes the buffer
    router0 = jax.device_get(
        state.params["params"]["blocks"]["block"]["mlp"]["router"]["kernel"])
    step = jax.jit(make_train_step(m, sched, tx), donate_argnums=(0,))
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (8, 4, 16, 16)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)}
    state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert jnp.isfinite(metrics["loss"])
    # aux losses reported and near balanced at init (uniform router)
    assert 0.9 < float(metrics["moe_load_balance"]) < 1.6
    assert float(metrics["moe_router_z"]) > 0
    # the router trained: only the aux losses give it a gradient path at
    # zero-init adaLN gates, so movement proves the aux loss reaches it
    router1 = state.params["params"]["blocks"]["block"]["mlp"]["router"]["kernel"]
    assert float(jnp.abs(router1 - router0).max()) > 0


def test_expert_parallel_forward_matches_unsharded():
    """ep-sharded forward over a ('data', 'expert') mesh == the single-
    device forward: sharding must never change the math."""
    mesh = create_expert_mesh(4, data=2)
    m = _moe_dit()
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, 16, 16))
    t = jnp.arange(8) % 100
    y = jnp.arange(8) % 10
    v = m.init({"params": jax.random.PRNGKey(0)}, x, t, y)
    want = m.apply(v, x, t, y)
    psh = param_shardings(v, mesh)
    wi_spec = psh["params"]["blocks"]["block"]["mlp"]["wi"].spec
    assert "expert" in wi_spec, wi_spec
    vs = jax.device_put(v, psh)
    xs, ts, ys = jax.device_put(
        (x, t, y), batch_sharding(mesh))
    got = jax.jit(m.apply)(vs, xs, ts, ys)
    assert jnp.abs(got - want).max() < 1e-4


def test_expert_parallel_sharded_train_step():
    mesh = create_expert_mesh(4, data=2)
    m = _moe_dit(remat=True)
    sched = DiffusionSchedule.create(get_named_beta_schedule("linear", 100))
    state, tx = create_train_state(m, jax.random.PRNGKey(0))
    jitted, st_sh = make_sharded_train_step(m, sched, tx, mesh, fsdp=True,
                                            example_state=state)
    state = jax.device_put(state, st_sh)
    batch = {"x": jax.random.normal(jax.random.PRNGKey(1), (16, 4, 16, 16)),
             "y": jax.random.randint(jax.random.PRNGKey(2), (16,), 0, 10)}
    batch = jax.device_put(batch, {"x": batch_sharding(mesh),
                                   "y": batch_sharding(mesh)})
    state, metrics = jitted(state, batch, jax.random.PRNGKey(3))
    assert jnp.isfinite(float(metrics["loss"]))
    assert jnp.isfinite(float(metrics["moe_load_balance"]))


def test_moe_bf16_preserves_activation_dtype():
    """The fp32 router must not leak fp32 into the expert path: a bf16
    block's MoeMlp output must be bf16 or the scan residual carry dtype
    mismatches under jit (caught driving train.py on the TPU backend)."""
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 32)).astype(jnp.bfloat16)
    moe = MoeMlp(4, 64, 32, dtype=jnp.bfloat16)
    v = moe.init(jax.random.PRNGKey(3), x)
    y = moe.apply(v, x)
    assert y.dtype == jnp.bfloat16
    # and the full bf16 MoE DiT forward compiles + runs under jit
    m = _moe_dit(dtype=jnp.bfloat16, remat=True)
    xb = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 16, 16))
    t = jnp.zeros((2,), jnp.int32)
    yl = jnp.zeros((2,), jnp.int32)
    vars_ = m.init({"params": jax.random.PRNGKey(0)}, xb, t, yl)
    out = jax.jit(m.apply)(vars_, xb, t, yl)
    assert out.dtype == jnp.float32 and out.shape == (2, 8, 16, 16)


def test_moe_registry_configs():
    for name in ("DiT-MoE-S/2-8E2A", "DiT-MoE-B/2-8E2A", "DiT-MoE-XL/2-8E2A"):
        m = DiT_models[name](input_size=16)
        assert m.moe_experts == 8 and m.moe_top_k == 2


def test_moe_combine_weights_sum_to_one():
    """Kept top-k gates are renormalized: a token dispatched without
    overflow contributes its MLP output with total weight 1 (checked via
    identity experts: wi = [I; 0]-style passthrough is overkill — instead
    force E=2, k=2 so every token reaches both experts and compare against
    manual per-expert dense passes)."""
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 16))
    moe = MoeMlp(2, 32, 16, top_k=2, capacity_factor=2.0)
    v = moe.init(jax.random.PRNGKey(4), x)
    p = v["params"]
    # manual: softmax router over 2 experts, k=2 keeps both, renorm -> the
    # original probabilities; output = sum_e prob_e * dense_e(x)
    logits = x @ p["router"]["kernel"]
    gates = jax.nn.softmax(logits, axis=-1)

    def dense(e):
        h = jax.nn.gelu(x @ p["wi"][e] + p["bi"][e], approximate=True)
        return h @ p["wo"][e] + p["bo"][e]

    want = gates[..., :1] * dense(0) + gates[..., 1:] * dense(1)
    got = moe.apply(v, x)
    assert jnp.abs(got - want).max() < 1e-5


def test_stacked_expert_init_matches_dense_scale():
    """Each expert's (D, H) kernel must initialize at the DENSE xavier scale
    — flax's fan computation on a stacked (E, D, H) kernel would shrink it
    by ~sqrt(E) (advisor round-4 finding, invisible to the E=1 test)."""
    import numpy as np

    from fast_dit_tpu.models.layers import xavier_uniform
    from fast_dit_tpu.models.moe import stacked_xavier_uniform

    E, D, H = 8, 64, 256
    stacked = stacked_xavier_uniform(jax.random.PRNGKey(0), (E, D, H))
    dense = xavier_uniform(jax.random.PRNGKey(1), (D, H))
    for e in range(E):
        ratio = float(jnp.std(stacked[e]) / jnp.std(dense))
        assert 0.8 < ratio < 1.25, (e, ratio)
    # experts are NOT identical copies
    assert float(jnp.abs(stacked[0] - stacked[1]).max()) > 0


def test_top_k_never_reselects_on_underflow():
    """With one dominant gate and the rest exactly 0, k=2 must pick two
    DISTINCT experts (multiplicative masking would re-pick expert argmax=0
    and burn a capacity slot)."""
    from fast_dit_tpu.models.moe import _top_k_one_hot

    gates = jnp.array([[[0.0, 1.0, 0.0, 0.0]]])  # underflowed except e1
    sel, topg = _top_k_one_hot(gates, 2)
    chosen = jnp.argmax(sel[0, 0], axis=-1)
    assert chosen[0] != chosen[1]
    assert int(jnp.sum(sel)) == 2


def test_moe_export_pt_raises_clear_error():
    """flax_to_state_dict on a MoE tree must fail with a clear ValueError,
    not a KeyError mid-walk (there is no reference torch format for MoE)."""
    from fast_dit_tpu.ckpt.torch_import import flax_to_state_dict

    m = _moe_dit()
    x = jnp.ones((1, 4, 16, 16))
    v = m.init({"params": jax.random.PRNGKey(0)}, x,
               jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32))
    with pytest.raises(ValueError, match="MoE"):
        flax_to_state_dict(v, patch_size=4)


def test_moe_rejects_custom_model_call():
    """A custom model_call with a MoE model would silently drop the router
    aux losses — make_train_step must refuse."""
    m = _moe_dit()
    betas = get_named_beta_schedule("squaredcos_cap_v2", 64)
    sched = DiffusionSchedule.create(betas)
    with pytest.raises(AssertionError, match="model_call"):
        make_train_step(m, sched, None,
                        model_call=lambda *a: None)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
