"""Sequence (time-axis) pipeline parallelism vs the single-device step.

Runs on the virtual 8-device CPU mesh (conftest). The seq-pipeline step
must reproduce the plain train step's loss, gradients, metrics, and
batch-stat updates for zero-init, no-dropout models — the boundary-state
handoff, pipelined microbatching, psum'd BN stats, and closed-form
readout chunking are all exercised.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparch_tpu.models import build_model
from sparch_tpu.parallel.seqpipe import (
    make_seq_mesh,
    make_seqpipe_train_step,
    seq_batch_sharding,
)
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_train_step

B, T, F, H, C = 8, 24, 12, 16, 5


def _build(neuron, normalization, n_seq):
    model = build_model(
        neuron, (B, T, F), [H, H, C],
        dropout=0.0, normalization=normalization,
        state_init="zeros", cell_impl="scan",
    )
    x = (np.random.default_rng(0).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_seq_mesh(jax.devices()[:n_seq])
    return model, state, mesh, x, y


@pytest.mark.parametrize("neuron", ["LIF", "RadLIF"])
@pytest.mark.parametrize("normalization", ["batchnorm", "layernorm", "none"])
def test_seqpipe_matches_single_device(neuron, normalization):
    model, state, mesh, x, y = _build(neuron, normalization, 4)
    ref_step = make_train_step(model, donate=False, use_regularizers=True)
    pipe_step = make_seqpipe_train_step(
        model, mesh, n_micro=2, use_regularizers=True
    )

    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["acc"]), float(ref_metrics["acc"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["spike_rate"]), float(ref_metrics["spike_rate"]),
        rtol=1e-5,
    )
    # post-update parameters agree (i.e. the gradients agreed)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_state.params)
    flat_new = jax.tree_util.tree_leaves_with_path(new_state.params)
    for (kp_r, leaf_r), (kp_n, leaf_n) in zip(flat_ref, flat_new):
        assert kp_r == kp_n
        np.testing.assert_allclose(
            np.asarray(leaf_n), np.asarray(leaf_r), atol=2e-5,
            err_msg=jax.tree_util.keystr(kp_r),
        )
    # batch-stat running averages agree
    for (kp_r, leaf_r), (kp_n, leaf_n) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.batch_stats),
        jax.tree_util.tree_leaves_with_path(new_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(leaf_n), np.asarray(leaf_r), atol=1e-5,
            err_msg=jax.tree_util.keystr(kp_r),
        )


def test_seqpipe_eight_devices_microbatch_pipeline():
    """Deeper pipeline: 8 time shards x 4 microbatches, T=24 -> Tl=3."""
    model, state, mesh, x, y = _build("RLIF", "batchnorm", 8)
    ref_step = make_train_step(model, donate=False)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=4)
    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    kernels_ref = jax.tree_util.tree_leaves(ref_state.params)
    kernels_new = jax.tree_util.tree_leaves(new_state.params)
    for a, b in zip(kernels_new, kernels_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_seqpipe_rejects_unsupported():
    model = build_model(
        "LIF", (B, T, F), [H, C], dropout=0.0, bidirectional=True,
        state_init="zeros",
    )
    mesh = make_seq_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="bidirectional"):
        make_seqpipe_train_step(model, mesh)


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
def test_seqpipe_ann_matches_single_device(ann_type):
    """ANN family under the time pipeline: loss + post-update params match
    the single-device step (4 time shards, 2 microbatches)."""
    model = build_model(
        ann_type, (B, T, F), [H, H, C], dropout=0.0,
        normalization="batchnorm", cell_impl="scan",
    )
    x = np.random.default_rng(1).random((B, T, F)).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_seq_mesh(jax.devices()[:4])
    ref_step = make_train_step(model, donate=False)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    # f32 reduction-order noise (chunked + psum'd BN stats) propagates
    # through the smooth ANN activations — slightly looser than the SNN
    # comparisons, whose spike quantisation absorbs it
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=2e-4,
        err_msg=ann_type,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=ann_type
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.batch_stats),
        jax.tree_util.tree_leaves(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5, err_msg=ann_type
        )


def test_seqpipe_composite_data_seq_mesh():
    """dp x sp: batch shards over 'data' while each data group pipelines
    the time axis over 'seq' (2x4 over 8 CPU devices); loss/grads match
    the single-device step (global-batch BN stats included)."""
    model, state, _, x, y = _build("RadLIF", "batchnorm", 4)
    mesh = make_seq_mesh(jax.devices()[:8], data=2)
    ref_step = make_train_step(model, donate=False, use_regularizers=True)
    pipe_step = make_seqpipe_train_step(
        model, mesh, n_micro=2, use_regularizers=True
    )
    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["spike_rate"]), float(ref_metrics["spike_rate"]),
        rtol=1e-5,
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.batch_stats),
        jax.tree_util.tree_leaves(ref_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_seqpipe_eval_step_matches_single_device():
    """Pipelined eval (running BN stats) matches make_eval_step."""
    from sparch_tpu.parallel.seqpipe import make_seqpipe_eval_step
    from sparch_tpu.train.steps import make_eval_step

    model, state, mesh, x, y = _build("RadLIF", "batchnorm", 4)
    # one train step first so the running stats are non-trivial
    state, _ = make_train_step(model, donate=False)(state, x, y)
    ref_eval = make_eval_step(model)
    ref_metrics = ref_eval(state, x, y, jax.random.PRNGKey(0))
    pipe_eval = make_seqpipe_eval_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    metrics = pipe_eval(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["acc"]), float(ref_metrics["acc"]), rtol=1e-6
    )
