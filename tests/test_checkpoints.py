"""train/checkpoints.py: orbax save/restore roundtrip, step-dir naming,
keep-last-N pruning, and resume semantics (the reference's accelerate
checkpoint contract, checkpoints.py:9-38)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ucnerf_tpu import configs
from ucnerf_tpu.train import checkpoints as ckpt_lib
from ucnerf_tpu.train import state as state_lib
from ucnerf_tpu.train import step as step_lib


def _tiny_state():
    cfg = configs.tiny()
    model, params = step_lib.init_model(cfg, jax.random.PRNGKey(0))
    return cfg, model, state_lib.create_train_state(cfg, params)


def test_save_restore_roundtrip(tmp_path):
    cfg, model, state = _tiny_state()
    exp = str(tmp_path / "exp")
    path = ckpt_lib.save_checkpoint(exp, state, step=500,
                                    total_limit=cfg.checkpoints_total_limit)
    assert os.path.isdir(path) and path.endswith("500")

    restored, step = ckpt_lib.restore_checkpoint(exp, state)
    assert step == 500
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_without_checkpoint_returns_zero(tmp_path):
    _, _, state = _tiny_state()
    restored, step = ckpt_lib.restore_checkpoint(str(tmp_path / "none"),
                                                 state)
    assert step == 0
    assert restored is state


def test_keep_last_n_pruning(tmp_path):
    _, _, state = _tiny_state()
    exp = str(tmp_path / "exp")
    for s in (100, 200, 300):
        ckpt_lib.save_checkpoint(exp, state, step=s, total_limit=2)
    root = os.path.join(exp, "checkpoints")
    kept = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    assert kept == [200, 300]
    assert ckpt_lib.latest_checkpoint_step(exp) == 300


def test_resume_picks_numerically_highest_step(tmp_path):
    """Steps compare numerically, not lexicographically (step 1000 beats
    step 999 even though '1000' < '999' as strings)."""
    _, _, state = _tiny_state()
    exp = str(tmp_path / "exp")
    ckpt_lib.save_checkpoint(exp, state, step=999, total_limit=5)
    ckpt_lib.save_checkpoint(exp, state, step=1000, total_limit=5)
    assert ckpt_lib.latest_checkpoint_step(exp) == 1000


def test_resume_continues_training(tmp_path):
    """A restored state trains onward: the cli resume contract
    (resume_from_checkpoint, train.py:97-100 semantics)."""
    cfg, model, state = _tiny_state()
    train_step = step_lib.make_train_step(model, cfg)
    batch = jax.tree.map(jnp.asarray, step_lib.dummy_batch(cfg, 32))
    key = jax.random.PRNGKey(1)
    state, _ = train_step(state, batch, key, jnp.float32(0.1))

    exp = str(tmp_path / "exp")
    ckpt_lib.save_checkpoint(exp, state, step=1, total_limit=1)
    fresh = state_lib.create_train_state(
        cfg, step_lib.init_model(cfg, jax.random.PRNGKey(0))[1])
    restored, step = ckpt_lib.restore_checkpoint(exp, fresh)
    assert step == 1
    restored2, stats = train_step(restored, batch,
                                  jax.random.fold_in(key, 2),
                                  jnp.float32(0.2))
    assert np.isfinite(float(stats["loss"]))
    assert int(restored2.step) == 2
