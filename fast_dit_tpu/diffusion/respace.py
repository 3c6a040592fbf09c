"""Timestep-respacing mini-DSL.

Behavior-parity with `/root/reference/diffusion/respace.py:12-62`
(`space_timesteps`): "250" strides 1000 steps down to 250, "ddimN" uses the
fixed DDIM-paper striding, and "10,15,20" splits the process into equal
sections with per-section counts. The respaced *tables* are built by
`DiffusionSchedule.create(use_timesteps=...)`; the reference's `_WrappedModel`
timestep remap (respace.py:117-129) becomes a gather through
`schedule.timestep_map` inside the sampling scan instead of a Python wrapper.

Beyond-reference extension: "karrasN" (handled by `create_diffusion`, which
has the betas this selection needs) spaces the N retained timesteps at
Karras sigma positions (`karras_timesteps`) instead of uniformly in t —
the few-step solvers (DPM-Solver++/UniPC) track the probability-flow ODE
materially better on that grid at 5-25 steps.
"""

from __future__ import annotations

from itertools import accumulate, chain, repeat

import numpy as np

__all__ = ["space_timesteps", "karras_timesteps"]


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Pick which original-process timesteps a respaced process retains.

    :param num_timesteps: length of the original process.
    :param section_counts: list of ints, or a comma-separated string of ints
        (step count per equal section), or "ddimN" for DDIM-paper striding.
    :return: set of original-process timesteps to keep.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            want = int(section_counts[4:])
            # DDIM-paper fixed striding: the unique integer stride i with
            # ceil(num_timesteps / i) == want, if one exists
            strides = (i for i in range(1, num_timesteps)
                       if len(range(0, num_timesteps, i)) == want)
            stride = next(strides, None)
            if stride is None:
                raise ValueError(
                    f"cannot create exactly {want} steps with an integer stride")
            return set(range(0, num_timesteps, stride))
        section_counts = [int(x) for x in section_counts.split(",")]

    n_sections = len(section_counts)
    base, extra = divmod(num_timesteps, n_sections)
    sizes = [base + (1 if i < extra else 0) for i in range(n_sections)]
    starts = [sum(sizes[:i]) for i in range(n_sections)]

    kept: set = set()
    for start, size, count in zip(starts, sizes, section_counts):
        if size < count:
            raise ValueError(f"cannot divide section of {size} steps into {count}")
        # `count` fractional positions evenly spanning [0, size-1]. NOTE: the
        # positions are a left-to-right float ACCUMULATION (not j*stride) —
        # checkpoint compatibility requires reproducing the exact same
        # rounding the original accumulator produced.
        stride = 1.0 if count <= 1 else (size - 1) / (count - 1)
        positions = accumulate(chain([0.0], repeat(stride, count - 1)))
        kept.update(start + round(c) for c in positions)
    return kept


def karras_timesteps(alphas_cumprod, n: int, rho: float = 7.0) -> set:
    """Pick `n` original-process timesteps at Karras sigma positions.

    Karras et al. (arXiv:2206.00364, eq. 5) space noise levels as
        sigma_i = (smax^(1/rho) + i/(n-1) (smin^(1/rho) - smax^(1/rho)))^rho
    which concentrates steps at LOW noise where discretization error hurts
    most (rho=7 is the paper's image default). The discrete DDPM grid can't
    hit those sigmas exactly, so each is snapped to the nearest original
    timestep by VP sigma = sqrt((1-abar)/abar), with collisions nudged to
    the nearest free index so exactly `n` unique timesteps survive (the
    same guarantee the reference's section DSL gives,
    `/root/reference/diffusion/respace.py:12-62`). For n >= 2 the grid ends
    at sigma_min itself, so t=0 is always retained, like every grid the
    reference DSL produces.
    """
    abar = np.asarray(alphas_cumprod, np.float64)
    T = len(abar)
    if not 1 <= n <= T:
        raise ValueError(f"cannot pick {n} karras steps from {T}")
    sigmas = np.sqrt((1.0 - abar) / abar)  # monotone increasing in t
    smin, smax = sigmas[0], sigmas[-1]
    inv = 1.0 / rho
    grid = (smax ** inv
            + np.linspace(0.0, 1.0, n) * (smin ** inv - smax ** inv)) ** rho
    # snap to the nearest discrete timestep (searchsorted on the sigma grid)
    pos = np.searchsorted(sigmas, grid)
    lo = np.clip(pos - 1, 0, T - 1)
    hi = np.clip(pos, 0, T - 1)
    ts = np.where(np.abs(sigmas[lo] - grid) <= np.abs(sigmas[hi] - grid),
                  lo, hi)
    kept: set = set()
    for t in ts:  # grid is decreasing: large t first; nudge collisions down
        t = int(t)
        while t in kept and t > 0:
            t -= 1
        while t in kept:  # collided at 0: walk up instead
            t += 1
        kept.add(t)
    assert len(kept) == n and max(kept) < T
    return kept
