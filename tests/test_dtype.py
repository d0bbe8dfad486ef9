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


def test_bf16_integer_raster_input_is_lossless():
    """bf16 input batches (--input_dtype bfloat16): spike rasters are
    small-integer counts, exactly representable in bfloat16, so the
    convert-then-project path computes on bit-identical values. With
    deterministic reductions (norm=none) the whole train step — loss,
    metrics, every parameter gradient — must match the f32-input step
    bit-for-bit. (On real TPUs batchnorm's stats fusion may re-order its
    f32 reduction and flip spikes at the threshold; that is XLA-ulp
    class, not a precision loss — the projection itself was measured
    bit-exact on chip, see docs/STATUS.md.)"""
    rng = np.random.default_rng(1)
    x32 = rng.poisson(0.8, (B, T, F)).astype(np.float32)
    assert x32.max() < 256  # the exact-in-bf16 integer range
    x16 = jnp.asarray(x32).astype(jnp.bfloat16)
    y = jnp.asarray(np.arange(B) % C)

    model = build_model(
        "adLIF", (B, T, F), [16, C], dropout=0.1, state_init="uniform",
        normalization="none",
    )
    state = create_train_state(
        model, jnp.asarray(x32), lr=1e-2, rng=jax.random.PRNGKey(0)
    )
    step = make_train_step(model, donate=False)
    s32, m32 = step(state, jnp.asarray(x32), y)
    s16, m16 = step(state, x16, y)
    assert float(m32["loss"]) == float(m16["loss"])
    assert float(m32["acc"]) == float(m16["acc"])
    for a, b in zip(jax.tree.leaves(s32.params), jax.tree.leaves(s16.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


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
