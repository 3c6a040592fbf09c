"""Checkpoint/resume round trip — the recovery path the reference lacks
(SURVEY.md §5: 'No resume-from-checkpoint code path exists')."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_dit_tpu.ckpt import CheckpointManager
from fast_dit_tpu.diffusion import DiffusionSchedule, get_named_beta_schedule
from fast_dit_tpu.models import DiT
from fast_dit_tpu.train import create_train_state, make_train_step


def tiny():
    return DiT(input_size=16, patch_size=4, hidden_size=32, depth=2,
               num_heads=4, num_classes=10, attn_backend="xla")


def batch(seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {"x": jax.random.normal(k1, (8, 4, 16, 16)),
            "y": jax.random.randint(k2, (8,), 0, 10)}


def test_resume_continues_identically(tmp_path):
    model = tiny()
    sched = DiffusionSchedule.create(get_named_beta_schedule("linear", 100))
    state, tx = create_train_state(model, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, sched, tx))

    # run 3 steps, checkpoint, run 2 more -> reference trajectory
    for i in range(3):
        state, _ = step(state, batch(i), jax.random.PRNGKey(42))
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(int(state.step), jax.device_get(state))
    mgr.wait_until_finished()
    cont = state
    for i in range(3, 5):
        cont, m_ref = step(cont, batch(i), jax.random.PRNGKey(42))

    # restore and replay the same 2 steps
    template = jax.device_get(state)
    restored = mgr.restore(template=template)
    mgr.close()
    assert int(restored.step) == 3
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    resumed = restored
    for i in range(3, 5):
        resumed, m_new = step(resumed, batch(i), jax.random.PRNGKey(42))
    np.testing.assert_allclose(float(m_new["loss"]), float(m_ref["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(resumed.params), jax.tree.leaves(cont.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7)


def test_latest_step_and_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "c"), max_to_keep=2)
    tree = {"w": jnp.arange(4.0)}
    assert mgr.latest_step() is None
    for s in [10, 20, 30]:
        mgr.save(s, tree)
    mgr.wait_until_finished()
    assert mgr.latest_step() == 30
    out = mgr.restore(template=tree)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.arange(4.0))
    mgr.close()
