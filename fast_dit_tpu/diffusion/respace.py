"""Timestep-respacing mini-DSL.

Behavior-parity with `/root/reference/diffusion/respace.py:12-62`
(`space_timesteps`): "250" strides 1000 steps down to 250, "ddimN" uses the
fixed DDIM-paper striding, and "10,15,20" splits the process into equal
sections with per-section counts. The respaced *tables* are built by
`DiffusionSchedule.create(use_timesteps=...)`; the reference's `_WrappedModel`
timestep remap (respace.py:117-129) becomes a gather through
`schedule.timestep_map` inside the sampling scan instead of a Python wrapper.
"""

from __future__ import annotations

__all__ = ["space_timesteps"]


def space_timesteps(num_timesteps: int, section_counts) -> set:
    """Pick which original-process timesteps a respaced process retains.

    :param num_timesteps: length of the original process.
    :param section_counts: list of ints, or a comma-separated string of ints
        (step count per equal section), or "ddimN" for DDIM-paper striding.
    :return: set of original-process timesteps to keep.
    """
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)
