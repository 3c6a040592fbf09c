"""Mesh-parallel training tests on the virtual 8-device CPU mesh — coverage
the reference never had (its NCCL paths were untestable without GPUs)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from fast_dit_tpu.diffusion import DiffusionSchedule, get_named_beta_schedule
from fast_dit_tpu.models import DiT
from fast_dit_tpu.parallel import (
    batch_sharding,
    create_mesh,
    dit_param_spec,
    param_shardings,
    shard_params,
)
from fast_dit_tpu.train import (
    TrainState,
    create_train_state,
    make_sharded_train_step,
    make_train_step,
    update_ema,
)

IMG, C = 16, 4


def tiny_model(**kw):
    return DiT(input_size=IMG, patch_size=4, in_channels=C, hidden_size=32,
               depth=2, num_heads=4, num_classes=10, attn_backend="xla",
               class_dropout_prob=0.1, **kw)


def make_batch(B=16, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "x": jax.random.normal(k1, (B, C, IMG, IMG)),
        "y": jax.random.randint(k2, (B,), 0, 10),
    }


def sched():
    # NOTE: at very small T the Ho-scaled linear schedule reaches beta=1
    # (alphas_cumprod -> 0, inf tables), so use T=100 here.
    return DiffusionSchedule.create(get_named_beta_schedule("linear", 100))


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert mesh.shape == {"data": 8, "model": 1}
    mesh = create_mesh(model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(AssertionError):
        create_mesh(model=3)


def test_tp_param_specs():
    from jax.sharding import PartitionSpec as P
    mesh = create_mesh(model=2)
    spec = dit_param_spec("params/blocks/block/attn/qkv/kernel",
                          (2, 32, 3, 4, 8), tp=True, fsdp=False, mesh=mesh)
    assert spec == P(None, None, None, "model", None)
    spec = dit_param_spec("params/blocks/block/mlp/fc2/kernel",
                          (2, 128, 32), tp=True, fsdp=False, mesh=mesh)
    assert spec == P(None, "model", None)
    # non-TP params stay replicated
    spec = dit_param_spec("params/x_embedder/proj/kernel", (64, 32),
                          tp=True, fsdp=False, mesh=mesh)
    assert spec == P(None, None)


def test_fsdp_spec_shards_largest_axis():
    from jax.sharding import PartitionSpec as P
    mesh = create_mesh()  # data=8
    spec = dit_param_spec("params/t_embedder/fc1/kernel", (256, 32),
                          tp=False, fsdp=True, mesh=mesh)
    assert spec == P("data", None)


def single_device_reference(model, batch, n_steps=3):
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, schedule, tx))
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    return state, losses


@pytest.mark.parametrize("tp,fsdp,model_axis", [
    (False, False, 1),   # pure dp over 8
    (True, False, 2),    # dp=4 x tp=2
    (False, True, 1),    # fsdp over data axis
    (True, True, 2),     # fsdp + tp
])
def test_sharded_step_matches_single_device(tp, fsdp, model_axis):
    """The GSPMD-sharded step must be numerically equivalent to the
    single-device step (same batch, same rngs)."""
    model = tiny_model()
    batch = make_batch()
    ref_state, ref_losses = single_device_reference(model, batch)

    mesh = create_mesh(model=model_axis)
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    jitted, st_sh = make_sharded_train_step(
        model, schedule, tx, mesh, tp=tp, fsdp=fsdp, example_state=state)
    state = jax.device_put(state, st_sh)
    sharded_batch = jax.device_put(
        batch, {"x": batch_sharding(mesh), "y": batch_sharding(mesh)})

    losses = []
    for i in range(3):
        state, metrics = jitted(state, sharded_batch, jax.random.PRNGKey(100))
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses, ref_losses, rtol=2e-4, atol=2e-5)

    # final params match too
    ref_flat = jax.tree.leaves(ref_state.params)
    got_flat = jax.tree.leaves(jax.device_get(state.params))
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-5)


def test_params_actually_sharded():
    model = tiny_model()
    mesh = create_mesh(model=2)
    state, _ = create_train_state(model, jax.random.PRNGKey(0))
    params = shard_params(state.params, mesh, tp=True)
    qkv = params["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    # head axis split across 2 model shards
    assert len(qkv.sharding.device_set) == 16 or len(qkv.sharding.device_set) == 8
    shard_shapes = {s.data.shape for s in qkv.addressable_shards}
    assert shard_shapes == {(2, 32, 3, 2, 8)}  # H=4 -> 2 per shard


def test_ema_update():
    ema = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = update_ema(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


def test_loss_decreases_overfit():
    """Sanity: a few steps on one fixed batch reduce the loss (the
    reference's loss-curve regression logs play this role, SURVEY.md §4)."""
    model = tiny_model()
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   lr=2e-3)
    step = jax.jit(make_train_step(model, schedule, tx))
    batch = make_batch(B=8)
    first = None
    for i in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        if first is None:
            first = float(metrics["mse"])
    assert float(metrics["mse"]) < first * 0.9, (first, float(metrics["mse"]))
    assert int(state.step) == 30


def test_grad_accum_runs():
    model = tiny_model()
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, schedule, tx, grad_accum=4))
    state, metrics = step(state, make_batch(B=16), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.step) == 1


def test_grad_accum_with_loss_aware_sampler():
    """The loss-second-moment ring buffer must advance across microbatches
    inside the grad-accum scan (one update per microbatch, sequentially)."""
    from fast_dit_tpu.diffusion import create_named_schedule_sampler

    model = tiny_model()
    schedule = sched()
    sampler = create_named_schedule_sampler("loss-second-moment",
                                            schedule.num_timesteps)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   sampler_state=sampler)
    step = jax.jit(make_train_step(model, schedule, tx, grad_accum=4))
    before = np.asarray(state.sampler_state.loss_counts).sum()
    state, metrics = step(state, make_batch(B=16), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(state.sampler_state.loss_counts).sum()
    # 4 microbatches x 4 examples = 16 recorded losses
    assert after - before == 16, (before, after)


def test_mixed_precision_master_weights():
    """bf16 params + fp32 master: params track master, EMA is fp32, loss
    decreases; sharded variant compiles and matches structure."""
    from fast_dit_tpu.train import get_master_params
    model = tiny_model(dtype=jnp.bfloat16)
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), lr=2e-3,
                                   mixed_precision=True)
    assert all(p.dtype == jnp.bfloat16 for p in jax.tree.leaves(state.params))
    master = get_master_params(state.opt_state)
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(master))
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(state.ema))

    step = jax.jit(make_train_step(model, schedule, tx))
    batch = make_batch(B=8)
    first = None
    for _ in range(30):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        if first is None:
            first = float(metrics["mse"])
    assert float(metrics["mse"]) < first * 0.95
    # params == cast(master) up to one bf16 ulp (p + (cast(m) - p) re-rounds)
    master = get_master_params(state.opt_state)
    for p, m in zip(jax.tree.leaves(state.params), jax.tree.leaves(master)):
        np.testing.assert_allclose(
            np.asarray(p, np.float32), np.asarray(m.astype(jnp.bfloat16), np.float32),
            rtol=0.02, atol=1e-5)


def test_mixed_precision_sharded():
    model = tiny_model(dtype=jnp.bfloat16)
    mesh = create_mesh(model=2)
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   mixed_precision=True)
    jitted, st_sh = make_sharded_train_step(
        model, schedule, tx, mesh, tp=True, fsdp=True, example_state=state)
    state = jax.device_put(state, st_sh)
    batch = jax.device_put(make_batch(),
                           {"x": batch_sharding(mesh), "y": batch_sharding(mesh)})
    state, metrics = jitted(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_loss_aware_sampler_in_train_step():
    """--schedule-sampler loss-second-moment: the sampler state updates in
    the jitted step and the objective stays importance-weighted."""
    from fast_dit_tpu.diffusion import create_named_schedule_sampler
    model = tiny_model()
    schedule = sched()
    sampler = create_named_schedule_sampler("loss-second-moment",
                                            schedule.num_timesteps)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   sampler_state=sampler)
    step = jax.jit(make_train_step(model, schedule, tx))
    batch = make_batch(B=8)
    before = np.asarray(state.sampler_state.loss_counts).sum()
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    after = np.asarray(state.sampler_state.loss_counts).sum()
    assert after == before + 3 * 8
    assert np.isfinite(float(metrics["loss"]))


def test_nvs_model_trains_via_model_call():
    """DiTNVS (DINO cross-attention) trains through the model_call hook —
    the reference's own trainer cannot train its fork model at all
    (wrong forward arity, SURVEY.md §0)."""
    from fast_dit_tpu.nvs import DiTNVS
    model = DiTNVS(input_size=IMG, patch_size=4, hidden_size=32, depth=2,
                   num_heads=4, num_classes=10, dino_dim=24, cross_layers=(1,),
                   attn_backend="xla")
    schedule = sched()
    x = jnp.zeros((1, C, IMG, IMG))
    dino = jnp.zeros((1, 24, 4, 4))
    params = model.init({"params": jax.random.PRNGKey(0)}, x,
                        jnp.zeros(1, jnp.int32), dino, jnp.zeros(1, jnp.int32))
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       ema=jax.tree.map(jnp.copy, params),
                       opt_state=None, sampler_state=None)
    import optax
    tx = optax.adamw(2e-3)
    state = state.replace(opt_state=tx.init(params))

    def model_call(p, x_t, t_model, batch, drop_rng):
        return model.apply(p, x_t, t_model, batch["dino_feat"], batch["y"],
                           train=True, rngs={"label_drop": drop_rng})

    step = jax.jit(make_train_step(model, schedule, tx, model_call=model_call))
    batch = dict(make_batch(B=8),
                 dino_feat=jax.random.normal(jax.random.PRNGKey(3), (8, 24, 4, 4)))
    first = None
    for _ in range(25):
        state, metrics = step(state, batch, jax.random.PRNGKey(7))
        if first is None:
            first = float(metrics["mse"])
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["mse"]) < first, (first, float(metrics["mse"]))


def test_grad_accum_with_extra_batch_keys():
    model = tiny_model()
    schedule = sched()
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, schedule, tx, grad_accum=2))
    batch = dict(make_batch(B=16), aux=jnp.arange(16.0))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
