"""Training step: loss decreases / overfits a tiny batch; regularizer
contributes; metrics stay on device; eval is deterministic in zeros mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparch_tpu.models import build_model
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_eval_step, make_train_step

B, T, F, C = 8, 20, 12, 3


def _toy_batch(seed=0):
    """Linearly separable spike-raster-like batch."""
    rng = np.random.default_rng(seed)
    y = np.arange(B) % C
    x = np.zeros((B, T, F), np.float32)
    block = F // C
    for i in range(B):
        c = y[i]
        x[i, :, c * block : (c + 1) * block] = rng.random((T, block)) > 0.3
    return jnp.asarray(x), jnp.asarray(y)


@pytest.mark.parametrize("model_type", ["LIF", "RadLIF", "GRU"])
def test_overfit_tiny_batch(model_type):
    x, y = _toy_batch()
    model = build_model(
        model_type, (B, T, F), [16, C], dropout=0.0,
        normalization="batchnorm", state_init="zeros",
    )
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    train_step = make_train_step(model)
    first_loss = None
    for i in range(60):
        state, metrics = train_step(state, x, y)
        if first_loss is None:
            first_loss = float(metrics["loss"])
    final_loss = float(metrics["loss"])
    final_acc = float(metrics["acc"])
    assert final_loss < first_loss * 0.7, (first_loss, final_loss)
    assert final_acc >= 0.9, final_acc


def test_regularizer_increases_gradient_pressure():
    x, y = _toy_batch()
    model = build_model(
        "LIF", (B, T, F), [16, C], dropout=0.0, state_init="zeros"
    )
    state = create_train_state(model, x, lr=1e-3, rng=jax.random.PRNGKey(0))
    # fmax=0 forces every firing neuron into the hinge penalty
    step_reg = make_train_step(
        model, use_regularizers=True, reg_factor=1.0, reg_fmin=0.0, reg_fmax=0.0,
        donate=False,
    )
    step_plain = make_train_step(model, donate=False)
    s_reg, m_reg = step_reg(state, x, y)
    s_plain, m_plain = step_plain(state, x, y)
    # logged loss excludes the regularizer (reference exp.py:362-372 quirk)
    np.testing.assert_allclose(
        float(m_reg["loss"]), float(m_plain["loss"]), rtol=1e-6
    )
    # but the parameter updates differ
    d = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s_reg.params, s_plain.params
    )
    assert max(jax.tree.leaves(d)) > 0


def test_eval_deterministic_zeros():
    x, y = _toy_batch()
    model = build_model("adLIF", (B, T, F), [16, C], state_init="zeros")
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    m1 = eval_step(state, x, y, jax.random.PRNGKey(5))
    m2 = eval_step(state, x, y, jax.random.PRNGKey(7))
    assert float(m1["loss"]) == float(m2["loss"])


def test_eval_stochastic_uniform_state():
    x, y = _toy_batch()
    model = build_model("LIF", (B, T, F), [16, C], state_init="uniform")
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)
    m1 = eval_step(state, x, y, jax.random.PRNGKey(5))
    m2 = eval_step(state, x, y, jax.random.PRNGKey(7))
    assert float(m1["loss"]) != float(m2["loss"])


def test_lr_injection():
    x, y = _toy_batch()
    model = build_model("LIF", (B, T, F), [8, C], state_init="zeros")
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    assert np.isclose(state.lr, 1e-2)
    state = state.set_lr(7e-3)
    assert np.isclose(state.lr, 7e-3)
    train_step = make_train_step(model)
    state, _ = train_step(state, x, y)  # still runs after mutation
    assert np.isclose(state.lr, 7e-3)
