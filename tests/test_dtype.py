"""bfloat16 compute path: hoisted matmuls in bf16 (MXU-friendly), params
and neuron state math still float32-dominated; training remains stable and
close to the f32 path."""
import jax
import jax.numpy as jnp
import numpy as np

from sparch_tpu.models import build_model
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step

B, T, F, C = 8, 12, 10, 3


def test_bf16_forward_close_to_f32():
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    kw = dict(dropout=0.0, state_init="zeros", normalization="batchnorm")
    m32 = build_model("RadLIF", (B, T, F), [16, C], **kw)
    m16 = build_model(
        "RadLIF", (B, T, F), [16, C], compute_dtype=jnp.bfloat16, **kw
    )
    v = m32.init({"params": jax.random.PRNGKey(0)}, x)
    out32, _ = m32.apply(v, x, train=False)
    out16, _ = m16.apply(v, x, train=False)
    assert out16.dtype == out32.dtype  # readout returns consistent dtype
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=0.3, rtol=0.1
    )


def test_bf16_training_step_runs_and_learns():
    rng = np.random.default_rng(0)
    y = np.arange(B) % C
    x = np.zeros((B, T, F), np.float32)
    blk = F // C
    for i in range(B):
        x[i, :, y[i] * blk : (y[i] + 1) * blk] = rng.random((T, blk)) > 0.3
    x, y = jnp.asarray(x), jnp.asarray(y)

    model = build_model(
        "LIF", (B, T, F), [16, C], dropout=0.0, state_init="zeros",
        compute_dtype=jnp.bfloat16,
    )
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    # params stay f32
    assert all(
        p.dtype == jnp.float32 for p in jax.tree.leaves(state.params)
    )
    step = make_train_step(model)
    first = None
    for _ in range(40):
        state, m = step(state, x, y)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
