"""Unit tests for the timestep-respacing string DSL
(reference respace.py:12-62 enumerates the cases; SURVEY.md §4 seam (b))."""

import pytest

from fast_dit_tpu.diffusion import space_timesteps


def test_plain_count():
    steps = space_timesteps(1000, "250")
    assert len(steps) == 250
    assert 0 in steps and 999 in steps
    assert all(0 <= s < 1000 for s in steps)


def test_full_identity():
    steps = space_timesteps(1000, [1000])
    assert steps == set(range(1000))


def test_ddim_striding():
    steps = space_timesteps(1000, "ddim50")
    assert steps == set(range(0, 1000, 20))
    steps = space_timesteps(1000, "ddim250")
    assert steps == set(range(0, 1000, 4))


def test_ddim_impossible():
    with pytest.raises(ValueError):
        space_timesteps(1000, "ddim999")


def test_sections_docstring_example():
    # 300 steps, sections [10, 15, 20]: 10 from first 100, 15 from second, 20 from third
    steps = space_timesteps(300, "10,15,20")
    assert len(steps) == 45
    assert sum(1 for s in steps if s < 100) == 10
    assert sum(1 for s in steps if 100 <= s < 200) == 15
    assert sum(1 for s in steps if 200 <= s < 300) == 20


def test_section_stride_values():
    # one section of 10 from 100: frac_stride = 99/9 = 11 -> 0,11,22,...,99
    steps = space_timesteps(100, "10")
    assert steps == {0, 11, 22, 33, 44, 55, 66, 77, 88, 99}


def test_section_too_small():
    with pytest.raises(ValueError):
        space_timesteps(10, "20")


def test_single_step_section():
    steps = space_timesteps(100, "1")
    assert steps == {0}


def test_list_input():
    assert space_timesteps(300, [10, 15, 20]) == space_timesteps(300, "10,15,20")


def test_uneven_sections():
    # 10 steps into 3 sections: sizes 4, 3, 3
    steps = space_timesteps(10, "2,2,2")
    assert len(steps) == 6
    assert sum(1 for s in steps if s < 4) == 2
    assert sum(1 for s in steps if 4 <= s < 7) == 2
    assert sum(1 for s in steps if 7 <= s < 10) == 2
