"""Training step: loss + grads + AdamW + EMA, one jitted program.

Capability parity with the reference trainer loop
(`/root/reference/train.py:192-239`): uniform timestep draw (:200),
`training_losses(...).mean()` (:203-204), AdamW lr=1e-4 wd=0 (:161), EMA
decay 0.9999 via in-place lerp (:40-51), loss averaged across processes
(:219-220). TPU-first: the whole step — including the EMA lerp and optimizer
update — is a single XLA program with donated state; under a data-sharded
batch the gradient all-reduce is emitted by GSPMD (no DDP wrapper), and the
ring-2 ablation ladder (grad ckpt / AMP / features) is flags on the model and
data path rather than script forks.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..diffusion.flow import flow_training_losses
from ..diffusion.gaussian import training_losses
from ..diffusion.schedule import DiffusionSchedule
from ..ops.fused_update import (FusedAdamWEmaState, fused_adamw_ema_apply,
                                fused_adamw_ema_init)
from ..parallel.mesh import batch_sharding, param_shardings, replicated_sharding
from ..diffusion.timestep_samplers import sample_timesteps, update_with_losses
from .mixed_precision import MasterWeightsState, get_master_params, masterize

__all__ = [
    "TrainState",
    "create_train_state",
    "update_ema",
    "make_train_step",
    "make_sharded_train_step",
]


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    ema: Any
    opt_state: Any
    # optional importance-sampling state (loss-second-moment resampler,
    # reference timestep_sampler.py:120-150); None = uniform timesteps
    sampler_state: Any = None


def update_ema(ema, params, decay: float = 0.9999):
    """ema <- decay*ema + (1-decay)*params (reference train.py:40-51)."""
    return jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p, ema, params)


def create_train_state(model, rng, *, lr: Optional[float] = None,
                       weight_decay: Optional[float] = None,
                       optimizer: Optional[optax.GradientTransformation] = None,
                       mixed_precision: bool = False,
                       mu_dtype=None,
                       nu_dtype=None,
                       factored_nu: bool = False,
                       fused_optimizer: bool = False,
                       sampler_state=None):
    """Init params + AdamW + warm-started EMA copy (reference train.py:147-179).

    With `mixed_precision`, model params are stored bf16 and the optimizer is
    wrapped with fp32 master weights (see mixed_precision.py); the EMA then
    tracks the fp32 master, as torch AMP's fp32 EMA does.

    With `fused_optimizer` (implies mixed precision), the optimizer state is
    the single-sweep AdamW+EMA update (`ops/fused_update.py`, ~2x the optax
    chain's update speed at XL/2 scale) and the returned tx is None — pass
    the same lr/weight_decay to make_train_step.
    """
    x = jnp.zeros((1, model.in_channels, model.input_size, model.input_size))
    params = model.init({"params": rng}, x, jnp.zeros((1,), jnp.int32),
                        jnp.zeros((1,), jnp.int32))
    if fused_optimizer:
        # the fused update bakes AdamW into the train step; a custom optax
        # chain cannot be combined with it, and lr/weight_decay take effect
        # via make_train_step's kwargs, not here
        assert optimizer is None, (
            "fused_optimizer replaces the optax optimizer; pass one or the "
            "other (and pass lr/weight_decay to make_train_step)")
        if lr is not None or weight_decay is not None:
            raise ValueError(
                "fused_optimizer=True ignores lr/weight_decay here — the "
                "fused update reads them from make_train_step(lr=..., "
                "weight_decay=...); pass them there instead")
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        opt_state = fused_adamw_ema_init(
            params, mu_dtype=mu_dtype or jnp.bfloat16,
            nu_dtype=nu_dtype or jnp.float32, factored=factored_nu)
        ema = jax.tree.map(jnp.copy, opt_state.master)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          ema=ema, opt_state=opt_state,
                          sampler_state=sampler_state), None
    if nu_dtype is not None or factored_nu:
        raise ValueError(
            "nu_dtype/factored_nu are fused-optimizer features "
            "(ops/fused_update.py); pass fused_optimizer=True")
    tx = optimizer if optimizer is not None else optax.adamw(
        1e-4 if lr is None else lr,
        weight_decay=0.0 if weight_decay is None else weight_decay,
        mu_dtype=mu_dtype)
    if mixed_precision:
        params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)
        tx = masterize(tx)
    opt_state = tx.init(params)
    # EMA warm start = exact copy (reference train.py:179, decay=0 update)
    master = get_master_params(opt_state)
    ema = jax.tree.map(jnp.copy, master if master is not None else params)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, ema=ema,
                      opt_state=opt_state, sampler_state=sampler_state), tx


def make_train_step(
    model,
    schedule: DiffusionSchedule,
    tx: Optional[optax.GradientTransformation],
    *,
    ema_decay: float = 0.9999,
    grad_accum: int = 1,
    log_grad_norm: bool = False,
    model_call: Optional[Callable] = None,
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    objective: str = "eps",
    flow_path: str = "linear",
    moe_aux_weight: float = 1e-2,
    moe_z_weight: float = 1e-3,
) -> Callable:
    """Build `train_step(state, batch, rng) -> (state, metrics)`.

    `objective="flow"` trains the SiT-family velocity-matching loss
    (`diffusion/flow.py`) instead of the DDPM eps/learned-sigma loss:
    continuous t ~ U[0, 1) replaces the discrete timestep draw, the model
    must be built with `learn_sigma=False`, and `schedule` is unused. The
    loss-aware timestep resampler is discrete-time machinery and does not
    apply.

    batch: {"x": (B, C, H, W) latents, "y": (B,) int labels, ...extra
    conditioning}. With `grad_accum > 1` the batch is split into microbatches
    and gradients are averaged inside the same XLA program (a lax.scan over
    chunks) — one optimizer step per global batch, for memory headroom.

    `model_call(params, x_t, t_model, batch, drop_rng)` overrides how the
    model is applied — e.g. for `DiTNVS`, pass the DINO features through:
        lambda p, xt, tm, b, r: model.apply(p, xt, tm, b["dino_feat"],
                                            b["y"], train=True,
                                            rngs={"label_drop": r})
    (the reference never could: its trainer calls the fork model with the
    wrong arity, SURVEY.md §0.)
    """

    # MoE routing aux losses (models/moe.py) are sown into the 'losses'
    # collection; apply mutably and stash the traced values in a cell read
    # back inside the SAME loss_for trace (so they join the loss and get
    # gradients — the router trains through them)
    is_moe = getattr(model, "moe_experts", 0) > 0
    assert not (is_moe and model_call is not None), (
        "custom model_call with a MoE model would silently drop the routing "
        "aux losses (they are sown into the 'losses' collection, which only "
        "default_model_call applies mutably) — the router could collapse. "
        "Extend default_model_call instead.")
    aux_cell = {}

    def default_model_call(params, x_t, t_model, batch, drop_rng):
        if is_moe:
            out, upd = model.apply(params, x_t, t_model, batch["y"],
                                   train=True, rngs={"label_drop": drop_rng},
                                   mutable=["losses"])
            aux_cell["losses"] = upd["losses"]
            return out
        return model.apply(params, x_t, t_model, batch["y"], train=True,
                           rngs={"label_drop": drop_rng})

    apply_model = model_call if model_call is not None else default_model_call
    assert objective in ("eps", "flow"), objective

    def loss_for(params, batch_mb, t, noise, weights, drop_rng):
        x = batch_mb["x"]

        def model_fn(x_t, t_model):
            return apply_model(params, x_t, t_model, batch_mb, drop_rng)
        if objective == "flow":
            terms = flow_training_losses(model_fn, x, t, noise, path=flow_path)
        else:
            terms = training_losses(schedule, model_fn, x, t, noise)
        per_example = terms["loss"]
        loss = (weights * per_example).mean()
        metrics = {k: v.mean() for k, v in terms.items()}
        if aux_cell:
            # per-layer scalars, stacked on axis 0 by the block scan
            sown = aux_cell.pop("losses")

            def _mean_of(name):
                leaves = [jnp.mean(v) for p, v in
                          jax.tree_util.tree_flatten_with_path(sown)[0]
                          if name in "/".join(
                              str(getattr(k, "key", k)) for k in p)]
                return jnp.mean(jnp.stack(leaves))

            lb, zl = _mean_of("load_balance"), _mean_of("router_z")
            loss = loss + moe_aux_weight * lb + moe_z_weight * zl
            metrics["moe_load_balance"] = lb
            metrics["moe_router_z"] = zl
            # telemetry only (never joins the loss): capacity-overflow rate
            metrics["moe_dropped_frac"] = _mean_of("dropped_frac")
        return loss, (metrics, per_example)

    def micro_grads(params, sampler_state, batch_mb, rng):
        rng_t, rng_noise, rng_drop = jax.random.split(rng, 3)
        x = batch_mb["x"]
        B = x.shape[0]
        if objective == "flow":
            assert sampler_state is None, (
                "the loss-second-moment resampler is discrete-time "
                "(reference timestep_sampler.py); flow matching draws "
                "continuous t ~ U[0, 1)")
            t = jax.random.uniform(rng_t, (B,), jnp.float32)
            weights = jnp.ones((B,), x.dtype)
        elif sampler_state is not None:
            t, weights = sample_timesteps(sampler_state, rng_t, B)
        else:
            t = jax.random.randint(rng_t, (B,), 0, schedule.num_timesteps)
            weights = jnp.ones((B,), x.dtype)
        noise = jax.random.normal(rng_noise, x.shape, x.dtype)
        (loss, (metrics, per_example)), grads = jax.value_and_grad(
            loss_for, has_aux=True)(params, batch_mb, t, noise, weights, rng_drop)
        if sampler_state is not None:
            sampler_state = update_with_losses(sampler_state, t, per_example)
        return grads, metrics, sampler_state

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        sampler_state = state.sampler_state
        if grad_accum == 1:
            grads, metrics, sampler_state = micro_grads(
                state.params, sampler_state, batch, rng)
        else:
            B = batch["x"].shape[0]
            assert B % grad_accum == 0
            mb = B // grad_accum
            chunks = jax.tree.map(
                lambda a: a.reshape(grad_accum, mb, *a.shape[1:]), batch)

            # the loss-aware sampler state threads through the scan carry, so
            # each microbatch sees the ring buffer updated by the previous one
            # (sequential, like the reference's per-batch update)
            def body(carry, batch_i):
                g_acc, samp, i = carry
                g, m, samp = micro_grads(state.params, samp, batch_i,
                                         jax.random.fold_in(rng, i))
                g_acc = jax.tree.map(jnp.add, g_acc, g)
                return (g_acc, samp, i + 1), m

            zero = jax.tree.map(jnp.zeros_like, state.params)
            (gsum, sampler_state, _), ms = jax.lax.scan(
                body, (zero, sampler_state, 0), chunks)
            grads = jax.tree.map(lambda g: g / grad_accum, gsum)
            metrics = {k: v.mean() for k, v in ms.items()}

        if isinstance(state.opt_state, FusedAdamWEmaState):
            # single-sweep AdamW + master + EMA (ops/fused_update.py);
            # lr/weight_decay come from make_train_step's kwargs
            params, opt_state, ema = fused_adamw_ema_apply(
                state.opt_state, grads, state.params, state.ema,
                lr=lr, weight_decay=weight_decay, ema_decay=ema_decay)
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            master = get_master_params(opt_state)
            ema = update_ema(state.ema,
                             master if master is not None else params,
                             ema_decay)
        new_state = TrainState(step=state.step + 1, params=params, ema=ema,
                               opt_state=opt_state, sampler_state=sampler_state)
        metrics = dict(metrics)
        if log_grad_norm:  # telemetry only: touches every grad buffer
            metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return train_step


def make_sharded_train_step(model, schedule, tx, mesh, *, tp: bool = False,
                            fsdp: bool = False, ema_decay: float = 0.9999,
                            grad_accum: int = 1, log_grad_norm: bool = False,
                            model_call: Optional[Callable] = None,
                            lr: float = 1e-4, weight_decay: float = 0.0,
                            objective: str = "eps", flow_path: str = "linear",
                            moe_aux_weight: float = 1e-2,
                            moe_z_weight: float = 1e-3,
                            example_state: TrainState = None):
    """jit the train step over a mesh: batch sharded on 'data', state sharded
    per the DiT param rules, state buffers donated."""
    step_fn = make_train_step(model, schedule, tx, ema_decay=ema_decay,
                              grad_accum=grad_accum, log_grad_norm=log_grad_norm,
                              model_call=model_call, lr=lr,
                              weight_decay=weight_decay, objective=objective,
                              flow_path=flow_path,
                              moe_aux_weight=moe_aux_weight,
                              moe_z_weight=moe_z_weight)
    assert example_state is not None, "need an example state for sharding layout"

    rep = replicated_sharding(mesh)
    pshard = param_shardings(example_state.params, mesh, tp=tp, fsdp=fsdp)

    def opt_shardings(node):
        # adam m/v and fp32 masters mirror the param tree: shard like params;
        # everything else (step counts, empty states) replicates
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=pshard, nu=pshard)
        if isinstance(node, FusedAdamWEmaState):
            # factored-nu leaves are tiny row/col vectors: replicate them;
            # dense nu leaves mirror the param tree
            from ..ops.fused_update import FactoredNu
            nu_sh = jax.tree.map(
                lambda n, ps: (jax.tree.map(lambda _: rep, n)
                               if isinstance(n, FactoredNu) else ps),
                node.nu, pshard,
                is_leaf=lambda n: isinstance(n, FactoredNu))
            return FusedAdamWEmaState(count=rep, mu=pshard, nu=nu_sh,
                                      master=pshard)
        if isinstance(node, MasterWeightsState):
            return MasterWeightsState(
                master=pshard,
                inner=jax.tree.map(
                    opt_shardings, node.inner,
                    is_leaf=lambda n: isinstance(n, optax.ScaleByAdamState)))
        return jax.tree.map(lambda _: rep, node)

    st_sh = TrainState(
        step=rep,
        params=pshard,
        ema=param_shardings(example_state.ema, mesh, tp=tp, fsdp=fsdp),
        opt_state=jax.tree.map(
            opt_shardings, example_state.opt_state,
            is_leaf=lambda n: isinstance(
                n, (optax.ScaleByAdamState, MasterWeightsState,
                    FusedAdamWEmaState))),
        sampler_state=jax.tree.map(lambda _: rep, example_state.sampler_state),
    )

    # batch: every entry (x, y, and any extra conditioning like dino_feat)
    # is sharded on its leading/batch dimension
    data_sh = None  # caller device_puts each batch key with batch_sharding
    rep = replicated_sharding(mesh)

    if mesh.devices.size == 1:
        # single chip: identical math, but skip the GSPMD in_shardings — a
        # 1-device mesh gains nothing from the SPMD partitioner, and the
        # partitioner pass has crashed the remote compile service on the
        # largest remat+grad-accum programs (XL/2 bs128 accum>=2). The
        # returned sharding tree still places the state (device_put works
        # with NamedSharding over a 1-device mesh).
        jitted = jax.jit(step_fn, donate_argnums=(0,))
        return jitted, st_sh

    jitted = jax.jit(
        step_fn,
        in_shardings=(st_sh, data_sh, rep),
        out_shardings=(st_sh, None),
        donate_argnums=(0,),
    )
    return jitted, st_sh
