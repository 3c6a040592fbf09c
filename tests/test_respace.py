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


# ---------------------------------------------------------------------------
# Karras sigma spacing (beyond-reference extension, respace.karras_timesteps)
# ---------------------------------------------------------------------------

def _abar(T=1000):
    import numpy as np
    from fast_dit_tpu.diffusion import get_named_beta_schedule
    return np.cumprod(1.0 - get_named_beta_schedule("linear", T))


def test_karras_structural():
    from fast_dit_tpu.diffusion import karras_timesteps
    abar = _abar()
    for n in (2, 5, 10, 25, 250):
        steps = karras_timesteps(abar, n)
        assert len(steps) == n
        assert all(0 <= s < 1000 for s in steps)
        # endpoints: sigma_max -> t=999, sigma_min -> t=0
        assert 0 in steps and 999 in steps


def test_karras_denser_at_low_noise():
    """rho=7 concentrates retained steps at LOW noise: the bottom decile of
    the chain must hold several of them (uniform spacing puts exactly one
    below t=100 for n=20; the measured karras-7 grid puts five there)."""
    from fast_dit_tpu.diffusion import karras_timesteps
    steps = karras_timesteps(_abar(), 20)
    assert sum(1 for s in steps if s < 100) >= 4


def test_karras_bad_count():
    from fast_dit_tpu.diffusion import karras_timesteps
    with pytest.raises(ValueError):
        karras_timesteps(_abar(100), 101)


def test_create_diffusion_karras_string():
    from fast_dit_tpu.diffusion import create_diffusion
    diff = create_diffusion("karras10")
    assert diff.num_timesteps == 10
    import numpy as np
    tmap = np.asarray(diff.schedule.timestep_map)
    assert tmap[0] == 0 and tmap[-1] == 999 and len(set(tmap.tolist())) == 10


def test_karras_improves_few_step_solvers():
    """The measured reason this exists: at 10 steps the few-step solvers
    track a fine-grained deterministic solution far better on the Karras
    grid than on the uniform grid (analytic-model probe)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from fast_dit_tpu.diffusion import create_diffusion

    def eps_model(x, t):
        scale = (0.3 + 0.1 * jnp.cos(t.astype(jnp.float32))
                 [:, None, None, None] / 10.0)
        eps = scale * jnp.tanh(x)
        return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)

    shape = (2, 4, 8, 8)
    z = jax.random.normal(jax.random.PRNGKey(2), shape)
    ref = create_diffusion("500").ddim_sample_loop(
        eps_model, shape, noise=z, eta=0.0, clip_denoised=False)

    def rel(a):
        a = np.asarray(a, np.float64)
        b = np.asarray(ref, np.float64)
        return float(np.linalg.norm(a - b) / np.linalg.norm(b))

    uni = create_diffusion("10")
    kar = create_diffusion("karras10")
    for fn in ("dpm_solver_sample_loop", "unipc_sample_loop"):
        e_uni = rel(getattr(uni, fn)(eps_model, shape, noise=z,
                                     clip_denoised=False))
        e_kar = rel(getattr(kar, fn)(eps_model, shape, noise=z,
                                     clip_denoised=False))
        assert e_kar < 0.5 * e_uni, (fn, e_kar, e_uni)
