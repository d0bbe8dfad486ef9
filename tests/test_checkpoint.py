"""Orbax checkpoint: full-state roundtrip (params, BN stats, Adam moments,
LR hyperparam, RNG, step) and overwrite-on-improve retention."""
import jax
import jax.numpy as jnp
import numpy as np

from sparch_tpu.models import build_model
from sparch_tpu.train.checkpoint import (
    checkpoint_exists,
    restore_checkpoint,
    save_checkpoint,
)
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step

B, T, F, C = 4, 10, 8, 3


def _setup():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    y = jnp.arange(B) % C
    model = build_model("adLIF", (B, T, F), [8, C], state_init="zeros")
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    return model, state, x, y


def _tree_equal(a, b):
    return all(
        jax.tree.leaves(
            jax.tree.map(lambda p, q: bool(jnp.array_equal(p, q)), a, b)
        )
    )


def test_roundtrip_after_training(tmp_path):
    model, state, x, y = _setup()
    step = make_train_step(model, donate=False)
    for _ in range(3):
        state, _ = step(state, x, y)
    state = state.set_lr(3e-3)

    ckdir = str(tmp_path / "checkpoints")
    import os

    os.makedirs(ckdir)
    save_checkpoint(ckdir, state, meta={"epoch": 3, "best_acc": 0.5})
    assert checkpoint_exists(ckdir)

    template = create_train_state(
        model, np.zeros((B, T, F), np.float32), lr=1e-2,
        rng=jax.random.PRNGKey(42),
    )
    restored, meta = restore_checkpoint(ckdir, template)

    assert meta == {"epoch": 3, "best_acc": 0.5}
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.batch_stats, state.batch_stats)
    assert int(restored.step) == 3
    assert np.isclose(restored.lr, 3e-3)
    # Adam moments restored exactly
    assert _tree_equal(restored.opt_state, state.opt_state)

    # training continues identically from the restored state
    s1, m1 = step(state, x, y)
    s2, m2 = step(restored, x, y)
    assert float(m1["loss"]) == float(m2["loss"])
    assert _tree_equal(s1.params, s2.params)


def test_overwrite_best(tmp_path):
    model, state, x, y = _setup()
    import os

    ckdir = str(tmp_path / "ck")
    os.makedirs(ckdir)
    save_checkpoint(ckdir, state, meta={"epoch": 1, "best_acc": 0.3})
    step = make_train_step(model, donate=False)
    state2, _ = step(state, x, y)
    save_checkpoint(ckdir, state2, meta={"epoch": 2, "best_acc": 0.6})
    restored, meta = restore_checkpoint(ckdir, state)
    assert meta["epoch"] == 2
    assert _tree_equal(restored.params, state2.params)
