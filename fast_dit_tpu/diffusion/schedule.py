"""Diffusion noise-schedule tables, computed in float64 and frozen as a pytree.

Capability parity with the reference's schedule construction
(`/root/reference/diffusion/gaussian_diffusion.py:58-141` for the beta
schedules, `:167-201` for derived tables, and
`/root/reference/diffusion/respace.py:73-87` for respaced-beta rebuild), but
designed TPU-first: all tables are built once on the host in fp64 numpy, then
stored as a single frozen `DiffusionSchedule` pytree of fp32 `jnp` arrays so
that samplers and losses are pure functions of `(schedule, ...)` and the whole
sampling chain can live inside one `jax.lax.scan`.
"""

from __future__ import annotations

import enum
import math

import jax.numpy as jnp
import numpy as np
from flax import struct

__all__ = [
    "MeanType",
    "VarType",
    "LossType",
    "get_beta_schedule",
    "get_named_beta_schedule",
    "betas_for_alpha_bar",
    "DiffusionSchedule",
]


class MeanType(str, enum.Enum):
    """What the model predicts (reference `ModelMeanType`, gaussian_diffusion.py:23)."""

    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class VarType(str, enum.Enum):
    """Model variance parameterization (reference `ModelVarType`, gaussian_diffusion.py:33)."""

    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


class LossType(str, enum.Enum):
    """Training loss flavor (reference `LossType`, gaussian_diffusion.py:46)."""

    MSE = "mse"
    RESCALED_MSE = "rescaled_mse"
    KL = "kl"
    RESCALED_KL = "rescaled_kl"

    def is_vb(self) -> bool:
        return self in (LossType.KL, LossType.RESCALED_KL)


def _warmup_beta(beta_start: float, beta_end: float, num_steps: int, warmup_frac: float) -> np.ndarray:
    betas = beta_end * np.ones(num_steps, dtype=np.float64)
    warmup_time = int(num_steps * warmup_frac)
    betas[:warmup_time] = np.linspace(beta_start, beta_end, warmup_time, dtype=np.float64)
    return betas


def get_beta_schedule(beta_schedule: str, *, beta_start: float, beta_end: float,
                      num_diffusion_timesteps: int) -> np.ndarray:
    """Legacy beta-schedule library (reference gaussian_diffusion.py:65-95)."""
    n = num_diffusion_timesteps
    if beta_schedule == "quad":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5, n, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, n, dtype=np.float64)
    elif beta_schedule == "warmup10":
        betas = _warmup_beta(beta_start, beta_end, n, 0.1)
    elif beta_schedule == "warmup50":
        betas = _warmup_beta(beta_start, beta_end, n, 0.5)
    elif beta_schedule == "const":
        betas = beta_end * np.ones(n, dtype=np.float64)
    elif beta_schedule == "jsd":  # 1/T, 1/(T-1), ..., 1
        betas = 1.0 / np.linspace(n, 1, n, dtype=np.float64)
    else:
        raise NotImplementedError(beta_schedule)
    assert betas.shape == (n,)
    return betas


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Named schedule library (reference gaussian_diffusion.py:98-122)."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return get_beta_schedule(
            "linear",
            beta_start=scale * 0.0001,
            beta_end=scale * 0.02,
            num_diffusion_timesteps=num_diffusion_timesteps,
        )
    elif schedule_name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps: int, alpha_bar, max_beta: float = 0.999) -> np.ndarray:
    """Discretize a continuous alpha-bar function (reference gaussian_diffusion.py:125-141)."""
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas)


def _derive_tables(betas: np.ndarray) -> dict:
    """All derived fp64 tables (reference gaussian_diffusion.py:167-201, :288-300)."""
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1, "betas must be 1-D"
    assert (betas > 0).all() and (betas <= 1).all()
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    if alphas_cumprod[-1] <= 0:
        import warnings

        warnings.warn(
            "alphas_cumprod reaches 0 (a beta equals 1 — e.g. the Ho-scaled "
            "linear schedule at very small T): sqrt_recip* tables are inf and "
            "sampling/losses at the final timestep will produce NaNs",
            RuntimeWarning, stacklevel=3)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    # log clipped: posterior variance is 0 at t=0
    if len(posterior_variance) > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
    else:
        posterior_log_variance_clipped = np.log(np.maximum(posterior_variance, 1e-20))

    # FIXED_LARGE uses beta_t with the t=0 slot patched to the posterior
    # variance at t=1 for a better decoder likelihood
    # (reference gaussian_diffusion.py:296-301).
    fixed_large_variance = np.append(posterior_variance[1], betas[1:]) if len(betas) > 1 else betas

    return dict(
        betas=betas,
        log_betas=np.log(betas),
        alphas_cumprod=alphas_cumprod,
        alphas_cumprod_prev=alphas_cumprod_prev,
        alphas_cumprod_next=alphas_cumprod_next,
        sqrt_alphas_cumprod=np.sqrt(alphas_cumprod),
        sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - alphas_cumprod),
        log_one_minus_alphas_cumprod=np.log(1.0 - alphas_cumprod),
        sqrt_recip_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod),
        sqrt_recipm1_alphas_cumprod=np.sqrt(1.0 / alphas_cumprod - 1),
        posterior_variance=posterior_variance,
        posterior_log_variance_clipped=posterior_log_variance_clipped,
        posterior_mean_coef1=betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod),
        posterior_mean_coef2=(1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod),
        fixed_large_variance=fixed_large_variance,
        log_fixed_large_variance=np.log(fixed_large_variance),
    )


@struct.dataclass
class DiffusionSchedule:
    """Frozen pytree of schedule tables plus static process configuration.

    All array fields are fp32 `jnp` arrays of shape `(num_timesteps,)` (the
    *respaced* length when a timestep subset is in use). `timestep_map` maps a
    respaced index to the original-process timestep the model should be
    conditioned on (reference respace.py:117-129 `_WrappedModel`).
    """

    betas: jnp.ndarray
    log_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    fixed_large_variance: jnp.ndarray
    log_fixed_large_variance: jnp.ndarray
    timestep_map: jnp.ndarray  # int32 (num_timesteps,)

    num_timesteps: int = struct.field(pytree_node=False)
    original_num_steps: int = struct.field(pytree_node=False)
    mean_type: MeanType = struct.field(pytree_node=False)
    var_type: VarType = struct.field(pytree_node=False)
    loss_type: LossType = struct.field(pytree_node=False)
    # full-precision alphas_cumprod kept as static host data so consumers
    # that do precision-sensitive table arithmetic (e.g. the guidance-interval
    # sigma band) don't re-derive it from the fp32-rounded device tables
    alphas_cumprod_fp64: tuple = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(
        cls,
        betas: np.ndarray,
        *,
        mean_type: MeanType = MeanType.EPSILON,
        var_type: VarType = VarType.LEARNED_RANGE,
        loss_type: LossType = LossType.MSE,
        use_timesteps=None,
        table_dtype=jnp.float32,
    ) -> "DiffusionSchedule":
        """Build a schedule, optionally respaced to a subset of timesteps.

        When `use_timesteps` is given, betas are rebuilt from the retained
        alphas_cumprod exactly as the reference does
        (respace.py:79-86): new_beta_i = 1 - abar_i / abar_last_kept.
        """
        betas = np.asarray(betas, dtype=np.float64)
        original_num_steps = len(betas)
        if use_timesteps is not None:
            use = set(int(t) for t in use_timesteps)
            alphas_cumprod = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas, timestep_map = [], []
            for i, abar in enumerate(alphas_cumprod):
                if i in use:
                    new_betas.append(1 - abar / last)
                    last = abar
                    timestep_map.append(i)
            betas = np.array(new_betas, dtype=np.float64)
        else:
            timestep_map = list(range(original_num_steps))

        tables = _derive_tables(betas)
        jnp_tables = {k: jnp.asarray(v, dtype=table_dtype) for k, v in tables.items()}
        return cls(
            **jnp_tables,
            timestep_map=jnp.asarray(timestep_map, dtype=jnp.int32),
            num_timesteps=len(betas),
            original_num_steps=original_num_steps,
            mean_type=MeanType(mean_type),
            var_type=VarType(var_type),
            loss_type=LossType(loss_type),
            alphas_cumprod_fp64=tuple(float(a) for a in tables["alphas_cumprod"]),
        )

    @classmethod
    def create_fp64_tables(cls, betas: np.ndarray, use_timesteps=None) -> dict:
        """Host-side fp64 numpy tables for golden tests and analysis."""
        betas = np.asarray(betas, dtype=np.float64)
        if use_timesteps is not None:
            use = set(int(t) for t in use_timesteps)
            alphas_cumprod = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas = []
            for i, abar in enumerate(alphas_cumprod):
                if i in use:
                    new_betas.append(1 - abar / last)
                    last = abar
            betas = np.array(new_betas, dtype=np.float64)
        return _derive_tables(betas)

    @property
    def is_respaced(self) -> bool:
        return self.num_timesteps != self.original_num_steps
