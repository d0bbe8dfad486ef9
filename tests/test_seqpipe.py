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


def test_seqpipe_bf16_input_matches_plain_step():
    """--seq_parallel composed with --input_dtype bfloat16 (both CLI
    flags): the time-pipelined step must accept bf16 raster batches and
    match the plain step fed the same bf16 input. Integer rasters are
    exact in bf16, so with deterministic reductions the match is exact
    (see test_dtype.py for the single-device bit-exactness pin)."""
    model, state, mesh, x, y = _build("adLIF", "none", 4)
    x16 = jnp.asarray(x).astype(jnp.bfloat16)
    ref_step = make_train_step(model, donate=False)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    ref_state, ref_metrics = ref_step(state, x16, y)
    xs = jax.device_put(x16, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.parametrize("model_type,normalization,use_bias", [
    ("RadLIF", "batchnorm", False), ("RadLIF", "none", False),
    ("LiGRU", "batchnorm", False), ("GRU", "layernorm", False),
    ("RNN", "none", False),
    # bias under AMP: cells.bias_add keeps the bias cotangent's row-sum
    # in f32 on both paths (monolithic vs per-shard + psum)
    ("RadLIF", "none", True), ("LiGRU", "batchnorm", True),
])
def test_seqpipe_amp_matches_single_device(model_type, normalization,
                                           use_bias):
    """--seq_parallel composed with --compute_dtype bfloat16: the
    pipelined step mirrors the single-device AMP semantics (bf16
    projections everywhere; the recurrence in the post-norm dtype — f32
    under batch/layernorm, bf16 under 'none'; f32 norm statistics, rate
    telemetry, and weight-gradient accumulation via cells.rec_dot).

    Assertions are GRADIENT-level (recovered from Adam's first moment,
    mu = (1-b1)*g at step 1), not post-update params: under AMP the two
    step functions are separately compiled modules whose bf16 roundings
    XLA may place differently (e.g. folding a f32->bf16->f32 convert
    round-trip into a dot on one path only), so gradients agree to bf16
    noise — and Adam turns any sub-noise sign flip on a near-zero
    element into a 2*lr param jump. The f32 (non-AMP) tests above pin
    the tight per-element contract; this test pins the AMP dtype flow."""
    model = build_model(
        model_type, (B, T, F), [H, H, C],
        dropout=0.0, normalization=normalization,
        state_init="zeros", cell_impl="scan", use_bias=use_bias,
        compute_dtype=jnp.bfloat16,
    )
    x = (np.random.default_rng(0).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_seq_mesh(jax.devices()[:4])
    ref_step = make_train_step(model, donate=False)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    if model.is_snn:  # guard against an at-chance (insensitive) forward
        assert float(ref_metrics["spike_rate"]) > 0.0
    # bf16 noise, not 1e-5: f32 reduction-order noise (e.g. psum'd vs
    # monolithic BN stats) ahead of a bf16 cast occasionally flips one
    # rounding, shifting the forward trajectory by ~bf16 eps
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=4e-3
    )

    def mu_leaves(s):
        return [
            (jax.tree_util.keystr(kp), np.asarray(v, np.float64))
            for kp, v in jax.tree_util.tree_leaves_with_path(s.opt_state)
            if "mu" in jax.tree_util.keystr(kp)
        ]

    ref_mu, new_mu = mu_leaves(ref_state), mu_leaves(new_state)
    assert len(ref_mu) == len(new_mu) > 0
    # If the losses differ beyond f32 noise, one bf16 rounding flipped
    # between the modules (f32 reduction-order noise in psum'd BN stats
    # quantized by a downstream bf16 cast) and the two trajectories
    # legitimately diverged — gradient deltas then reflect the flip, not
    # the dtype flow. Tight 2.5% when trajectories match; flip-tolerant
    # 15% otherwise (still 10x under any real dtype-flow bug).
    flipped = abs(float(metrics["loss"]) - float(ref_metrics["loss"])) \
        > 1e-5 * max(1.0, abs(float(ref_metrics["loss"])))
    factor = 0.15 if flipped else 0.025
    for (key, a), (_, b) in zip(ref_mu, new_mu):
        # 1e-3 absolute floor on mu: leaves whose true gradient is ~0
        # (bias under batchnorm cancels exactly) hold only cancellation
        # noise on both sides; still 10-100x under any real dtype bug
        tol = max(factor * float(np.max(np.abs(a))), 1e-3)
        np.testing.assert_allclose(b, a, atol=tol, err_msg=key)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        a64 = np.asarray(a, np.float64)
        np.testing.assert_allclose(
            np.asarray(b), a64,
            atol=5e-3 * max(1.0, float(np.max(np.abs(a64)))),
        )


def test_seqpipe_rejects_unsupported():
    model = build_model(
        "LIF", (B, T, F), [H, C], dropout=0.0, state_init="zeros",
        use_readout_layer=False,
    )
    mesh = make_seq_mesh(jax.devices()[:2])
    with pytest.raises(ValueError, match="readout"):
        make_seqpipe_train_step(model, mesh)


@pytest.mark.parametrize("neuron,normalization", [
    ("LIF", "batchnorm"), ("RadLIF", "batchnorm"), ("RadLIF", "layernorm"),
])
def test_seqpipe_bidirectional_matches_single_device(neuron, normalization):
    """The bidirectional batch trick across the sharded time axis: the
    backward half's data is globally time-flipped (local flip + ppermute
    shard reversal), both halves pipeline time-forward, and the merge
    un-flips before the feature concat. Deterministic config must match
    the single-device step exactly."""
    model = build_model(
        neuron, (B, T, F), [H, H, C], dropout=0.0,
        normalization=normalization, state_init="zeros",
        cell_impl="scan", bidirectional=True,
    )
    x = (np.random.default_rng(0).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    ref_state, ref_metrics = make_train_step(model, donate=False)(state, x, y)
    mesh = make_seq_mesh(jax.devices()[:4])
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["spike_rate"]), float(ref_metrics["spike_rate"]),
        rtol=1e-5,
    )
    for (kp_r, a), (kp_n, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        assert kp_r == kp_n
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=jax.tree_util.keystr(kp_r),
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parametrize("ann_type", ["RNN", "LiGRU"])
def test_seqpipe_bidirectional_ann_matches_single_device(ann_type):
    """ANN family + bidirectional under the time pipeline (MLP is
    excluded: the model itself rejects MLP+bidirectional, matching the
    reference anns.py)."""
    model = build_model(
        ann_type, (B, T, F), [H, H, C], dropout=0.0,
        normalization="batchnorm", cell_impl="scan", bidirectional=True,
    )
    x = np.random.default_rng(1).random((B, T, F)).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    ref_state, ref_metrics = make_train_step(model, donate=False)(state, x, y)
    mesh = make_seq_mesh(jax.devices()[:4])
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
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


def test_seqpipe_bidirectional_composite_tp():
    """Bidirectional + dp x sp x tp (2x2x2): the time-reversal ppermutes
    compose with the tensor-parallel feature sharding."""
    model = build_model(
        "RadLIF", (B, T, F), [H, H, C], dropout=0.0,
        normalization="batchnorm", state_init="zeros",
        cell_impl="scan", bidirectional=True,
    )
    x = (np.random.default_rng(2).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    ref_state, ref_metrics = make_train_step(model, donate=False)(state, x, y)
    mesh = make_seq_mesh(jax.devices()[:8], data=2, model=2)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(ref_state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def _oracle_default_recipe_step(model, state, x, y, noise):
    """Single-device scan oracle consuming the SAME explicit noise the
    seq-pipeline step draws (draw_noise is deterministic in state.rng):
    projection -> train-mode BN -> scan cell from the drawn states ->
    scaled keep mask -> readout from the drawn membrane start. Entirely
    free of shard_map/pipelining, so agreement pins the pipelined path's
    dropout and uniform-init semantics."""
    import optax

    from sparch_tpu.ops import cells
    from sparch_tpu.parallel.seqpipe import _merge_stats

    eps = 1e-5

    def bn_train(p, s, wx):
        flat = wx.reshape(-1, wx.shape[-1])
        mean = flat.mean(0)
        var = (flat * flat).mean(0) - mean * mean
        new = {
            "mean": 0.95 * s["mean"] + 0.05 * mean,
            "var": 0.95 * s["var"] + 0.05 * var,
        }
        wxn = (wx - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]
        return wxn, new

    def loss_fn(params):
        h = x
        new_stats = {}
        for i in range(model.num_layers - 1):
            name = f"layer_{i}"
            p = params[name]
            wx = h @ p["W"]["kernel"]
            wxn, ns = bn_train(
                p["norm"]["BatchNorm_0"],
                state.batch_stats[name]["norm"]["BatchNorm_0"], wx,
            )
            new_stats[name] = {"norm": {"BatchNorm_0": ns}}
            u0, w0, s0 = noise[name]["states"]
            h = cells.radlif_scan(
                wxn, p["alpha"], p["beta"], p["a"], p["b"], p["V"],
                model.threshold, u0, w0, s0,
            )
            h = h * noise[name]["mask"]
        pr = params["readout"]
        wxr = h @ pr["W"]["kernel"]
        wxrn, ns = bn_train(
            pr["norm"]["BatchNorm_0"],
            state.batch_stats["readout"]["norm"]["BatchNorm_0"], wxr,
        )
        new_stats["readout"] = {"norm": {"BatchNorm_0": ns}}
        out = cells.readout_sum(wxrn, pr["alpha"], noise["readout"]["u0"])
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
        return ce, new_stats

    (loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    merged = _merge_stats(state.batch_stats, new_stats)
    return state.apply_gradients(grads, merged), loss


def test_seqpipe_default_recipe_matches_noise_oracle():
    """The DEFAULT training recipe (dropout=0.1, state_init='uniform') on
    an 8-way time pipeline: loss, gradients (via post-update params), and
    batch-stat updates must match a single-device scan oracle consuming
    the identical drawn noise."""
    from sparch_tpu.parallel.seqpipe import draw_noise

    model = build_model(
        "RadLIF", (B, T, F), [H, H, C],
        dropout=0.1, normalization="batchnorm",
        state_init="uniform", cell_impl="scan",
    )
    x = (np.random.default_rng(3).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(7))
    mesh = make_seq_mesh(jax.devices()[:8])

    # the noise the pipe step will draw internally from state.rng
    _, noise_rng = jax.random.split(state.rng)
    noise = draw_noise(model, noise_rng, x.shape, train=True)
    assert "mask" in noise["layer_0"] and "states" in noise["layer_0"]
    oracle_state, oracle_loss = _oracle_default_recipe_step(
        model, state, x, y, noise
    )

    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(oracle_loss), rtol=1e-5
    )
    for (kp_o, a), (kp_n, b) in zip(
        jax.tree_util.tree_leaves_with_path(oracle_state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        assert kp_o == kp_n
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=jax.tree_util.keystr(kp_o),
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(oracle_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_seqpipe_bidirectional_default_recipe_oracle():
    """Bidirectional + the default recipe (dropout=0.1, 'uniform' init):
    the pipelined step must match a single-device scan oracle that runs
    the reference batch trick (bidir_concat / bidir_split) and consumes
    the identical drawn noise — mask on the MERGED (B, T, 2H) output,
    (2, B, H) per-direction state slots."""
    import optax

    from sparch_tpu.models.common import bidir_concat, bidir_split
    from sparch_tpu.ops import cells
    from sparch_tpu.parallel.seqpipe import _merge_stats, draw_noise

    model = build_model(
        "RadLIF", (B, T, F), [H, H, C], dropout=0.1,
        normalization="batchnorm", state_init="uniform",
        cell_impl="scan", bidirectional=True,
    )
    x = (np.random.default_rng(9).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(13))
    _, noise_rng = jax.random.split(state.rng)
    noise = draw_noise(model, noise_rng, x.shape, train=True)
    assert noise["layer_0"]["mask"].shape == (B, T, 2 * H)
    assert noise["layer_0"]["states"][0].shape == (2, B, H)

    eps = 1e-5

    def bn_train(p, s, wx):
        flat = wx.reshape(-1, wx.shape[-1])
        mean = flat.mean(0)
        var = (flat * flat).mean(0) - mean * mean
        new = {
            "mean": 0.95 * s["mean"] + 0.05 * mean,
            "var": 0.95 * s["var"] + 0.05 * var,
        }
        return (wx - mean) * jax.lax.rsqrt(var + eps) * p["scale"] \
            + p["bias"], new

    def loss_fn(params):
        h = x
        new_stats = {}
        for i in range(model.num_layers - 1):
            name = f"layer_{i}"
            p = params[name]
            h2 = bidir_concat(h)
            wx = h2 @ p["W"]["kernel"]
            wxn, ns = bn_train(
                p["norm"]["BatchNorm_0"],
                state.batch_stats[name]["norm"]["BatchNorm_0"], wx,
            )
            new_stats[name] = {"norm": {"BatchNorm_0": ns}}
            u0, w0, s0 = (
                s.reshape(-1, s.shape[-1]) for s in noise[name]["states"]
            )
            s = cells.radlif_scan(
                wxn, p["alpha"], p["beta"], p["a"], p["b"], p["V"],
                model.threshold, u0, w0, s0,
            )
            h = bidir_split(s) * noise[name]["mask"]
        pr = params["readout"]
        wxr = h @ pr["W"]["kernel"]
        wxrn, ns = bn_train(
            pr["norm"]["BatchNorm_0"],
            state.batch_stats["readout"]["norm"]["BatchNorm_0"], wxr,
        )
        new_stats["readout"] = {"norm": {"BatchNorm_0": ns}}
        out = cells.readout_sum(wxrn, pr["alpha"], noise["readout"]["u0"])
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
        return ce, new_stats

    (oracle_loss, new_stats), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    oracle_state = state.apply_gradients(
        grads, _merge_stats(state.batch_stats, new_stats)
    )

    mesh = make_seq_mesh(jax.devices()[:4])
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(oracle_loss), rtol=1e-5
    )
    for (kp_o, a), (kp_n, b) in zip(
        jax.tree_util.tree_leaves_with_path(oracle_state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        assert kp_o == kp_n
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=jax.tree_util.keystr(kp_o),
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(oracle_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_seqpipe_noise_is_mesh_invariant():
    """draw_noise runs at global shape outside shard_map, so the same
    state.rng must give bit-identical losses and updates on a 2-way seq
    mesh, an 8-way seq mesh, and a 2x4 data x seq composite."""
    model = build_model(
        "RadLIF", (B, T, F), [H, H, C],
        dropout=0.1, normalization="batchnorm",
        state_init="uniform", cell_impl="scan",
    )
    x = (np.random.default_rng(5).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    results = []
    for mesh in (
        make_seq_mesh(jax.devices()[:2]),
        make_seq_mesh(jax.devices()[:8]),
        make_seq_mesh(jax.devices()[:8], data=2),
        make_seq_mesh(jax.devices()[:8], data=2, model=2),
    ):
        # fresh (deterministic) state per mesh: the pipe step donates it
        state = create_train_state(
            model, x, lr=1e-2, rng=jax.random.PRNGKey(11)
        )
        step = make_seqpipe_train_step(model, mesh, n_micro=2)
        xs = jax.device_put(x, seq_batch_sharding(mesh))
        new_state, metrics = step(state, xs, y)
        results.append((float(metrics["loss"]),
                        jax.tree_util.tree_leaves(new_state.params)))
    for loss, params in results[1:]:
        np.testing.assert_allclose(loss, results[0][0], rtol=1e-6)
        for a, b in zip(params, results[0][1]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )


@pytest.mark.parametrize("model_type", ["RadLIF", "LiGRU"])
def test_seqpipe_amp_default_recipe_micro_invariant(model_type):
    """AMP (bf16) composed with the DEFAULT recipe (dropout=0.1, and
    'uniform' state init for the SNN): the drawn noise is identical for
    a given rng, so n_micro=1 vs n_micro=4 on the same mesh must agree
    at bf16-noise level — loss to bf16 rtol, gradients (Adam mu) to 2%
    of each leaf's max. Pins the microbatch split under the AMP dtype
    flow (the zero-dropout AMP matrix above can't see mask handling)."""
    kwargs = dict(
        dropout=0.1, normalization="batchnorm", cell_impl="scan",
        compute_dtype=jnp.bfloat16,
    )
    if model_type == "RadLIF":
        kwargs["state_init"] = "uniform"
    model = build_model(model_type, (B, T, F), [H, H, C], **kwargs)
    x = (np.random.default_rng(3).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    def fresh_state():  # the pipe step donates its state argument
        return create_train_state(
            model, x, lr=1e-2, rng=jax.random.PRNGKey(7)
        )

    mesh = make_seq_mesh(jax.devices()[:4])
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    runs = []
    for n_micro in (1, 4):
        step = make_seqpipe_train_step(model, mesh, n_micro=n_micro)
        runs.append(step(fresh_state(), xs, y))
    (s1, m1), (s4, m4) = runs
    assert np.isfinite(float(m1["loss"]))
    if model.is_snn:
        assert float(m1["spike_rate"]) > 0.0
    np.testing.assert_allclose(
        float(m4["loss"]), float(m1["loss"]), rtol=4e-3
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s1.opt_state),
        jax.tree_util.tree_leaves_with_path(s4.opt_state),
    ):
        key = jax.tree_util.keystr(kp)
        if "mu" not in key:
            continue
        a64, b64 = np.asarray(a, np.float64), np.asarray(b, np.float64)
        tol = 0.02 * max(float(np.max(np.abs(a64))), 1e-12)
        np.testing.assert_allclose(b64, a64, atol=tol, err_msg=key)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s4.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-4)


def test_seqpipe_ann_dropout_mesh_invariant():
    """ANN family with dropout: same rng, different time shardings agree
    (masks shard with the time axis)."""
    model = build_model(
        "LiGRU", (B, T, F), [H, C], dropout=0.2,
        normalization="batchnorm", cell_impl="scan",
    )
    x = np.random.default_rng(6).random((B, T, F)).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    def fresh_state():  # the pipe step donates its state argument
        return create_train_state(
            model, x, lr=1e-2, rng=jax.random.PRNGKey(2)
        )

    losses = []
    for n_seq in (2, 8):
        mesh = make_seq_mesh(jax.devices()[:n_seq])
        step = make_seqpipe_train_step(model, mesh, n_micro=2)
        xs = jax.device_put(x, seq_batch_sharding(mesh))
        _, metrics = step(fresh_state(), xs, y)
        losses.append(float(metrics["loss"]))
    # the masks are bit-identical across meshes; the residual is f32
    # reduction-order noise through the smooth ANN activations (chunked +
    # psum'd BN stats), same as the single-device comparison above
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-4)
    # dropout actually engaged: a dropout-free build differs materially
    model0 = model.clone(dropout=0.0)
    mesh = make_seq_mesh(jax.devices()[:2])
    step0 = make_seqpipe_train_step(model0, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    _, metrics0 = step0(fresh_state(), xs, y)
    assert abs(float(metrics0["loss"]) - losses[0]) > 1e-3


def test_seqpipe_eval_uniform_state_init():
    """Pipelined eval with 'uniform' init: takes an explicit rng (like
    make_eval_step), is mesh-invariant, and the key matters."""
    from sparch_tpu.parallel.seqpipe import make_seqpipe_eval_step

    model = build_model(
        "RadLIF", (B, T, F), [H, C], dropout=0.1,
        normalization="batchnorm", state_init="uniform", cell_impl="scan",
    )
    x = (np.random.default_rng(8).random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(4))
    key = jax.random.PRNGKey(21)
    losses = []
    for n_seq in (2, 8):
        mesh = make_seq_mesh(jax.devices()[:n_seq])
        ev = make_seqpipe_eval_step(model, mesh, n_micro=2)
        xs = jax.device_put(x, seq_batch_sharding(mesh))
        losses.append(float(ev(state, xs, y, key)["loss"]))
    np.testing.assert_allclose(losses[1], losses[0], rtol=1e-6)
    mesh = make_seq_mesh(jax.devices()[:2])
    ev = make_seqpipe_eval_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    other = float(ev(state, xs, y, jax.random.PRNGKey(22))["loss"])
    assert abs(other - losses[0]) > 1e-8  # states actually drawn
    with pytest.raises(ValueError, match="rng"):
        ev(state, xs, y)


def test_draw_noise_distribution():
    """Scaled keep masks: values in {0, 1/(1-p)}, keep fraction ~ 1-p,
    independent across layers; uniform states in [0, 1)."""
    from sparch_tpu.parallel.seqpipe import draw_noise

    model = build_model(
        "RadLIF", (64, 50, F), [H, H, C], dropout=0.25,
        state_init="uniform", cell_impl="scan",
    )
    noise = draw_noise(model, jax.random.PRNGKey(0), (64, 50, F))
    m0 = np.asarray(noise["layer_0"]["mask"])
    m1 = np.asarray(noise["layer_1"]["mask"])
    np.testing.assert_allclose(
        np.unique(m0), [0.0, 1.0 / 0.75], rtol=1e-6
    )
    assert abs((m0 > 0).mean() - 0.75) < 0.02
    assert not np.array_equal(m0 > 0, m1 > 0)
    u0, w0, s0 = (np.asarray(s) for s in noise["layer_0"]["states"])
    assert 0 <= u0.min() and u0.max() < 1 and u0.std() > 0.2
    assert w0.std() > 0.2 and s0.std() > 0.2  # adaptive: all three drawn
    ur = np.asarray(noise["readout"]["u0"])
    assert ur.shape == (64, C) and ur.std() > 0.2
    # eval: no masks, states still drawn
    ev = draw_noise(model, jax.random.PRNGKey(0), (64, 50, F), train=False)
    assert "mask" not in ev["layer_0"] and "states" in ev["layer_0"]
    # bidirectional: mask covers the merged (B, T, 2H) output; state
    # slots are (2, B, H) per-direction rows
    bid = draw_noise(
        model.clone(bidirectional=True), jax.random.PRNGKey(0), (64, 50, F)
    )
    assert bid["layer_0"]["mask"].shape == (64, 50, 2 * H)
    assert bid["layer_0"]["states"][0].shape == (2, 64, H)


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


@pytest.mark.parametrize("neuron,normalization", [
    ("RadLIF", "batchnorm"), ("RLIF", "layernorm"), ("LIF", "none"),
])
def test_seqpipe_tensor_parallel_matches_single_device(
    neuron, normalization
):
    """dp x sp x tp (2x2x2 over the 8 CPU devices): hidden weight
    matrices column-shard over 'model', the recurrence carries sharded
    membranes + a feature-full spike vector (one all_gather per step),
    and loss/gradients/batch-stats must still match the single-device
    step exactly."""
    model, state, _, x, y = _build(neuron, normalization, 4)
    mesh = make_seq_mesh(jax.devices()[:8], data=2, model=2)
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
    for (kp_r, a), (kp_n, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.params),
        jax.tree_util.tree_leaves_with_path(new_state.params),
    ):
        assert kp_r == kp_n
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=2e-5,
            err_msg=f"{neuron}/{normalization} {jax.tree_util.keystr(kp_r)}",
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
def test_seqpipe_ann_tensor_parallel(ann_type):
    """ANN family under sp x tp (4x2): per-gate kernels and V matrices
    sharded; y carried feature-full (GRU gathers r*y too)."""
    model = build_model(
        ann_type, (B, T, F), [H, H, C], dropout=0.0,
        normalization="batchnorm", cell_impl="scan",
    )
    x = np.random.default_rng(9).random((B, T, F)).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_seq_mesh(jax.devices()[:8], model=2)
    ref_step = make_train_step(model, donate=False)
    pipe_step = make_seqpipe_train_step(model, mesh, n_micro=2)
    ref_state, ref_metrics = ref_step(state, x, y)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe_step(state, xs, y)
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


def test_seqpipe_tp_eval_matches_single_device():
    """Pipelined eval under dp x sp x tp (running BN stats read through
    the feature-shard slice path) matches make_eval_step."""
    from sparch_tpu.parallel.seqpipe import make_seqpipe_eval_step
    from sparch_tpu.train.steps import make_eval_step

    model, state, _, x, y = _build("RadLIF", "batchnorm", 4)
    # one train step so the running stats are non-trivial
    state, _ = make_train_step(model, donate=False)(state, x, y)
    mesh = make_seq_mesh(jax.devices()[:8], data=2, model=2)
    ref = make_eval_step(model)(state, x, y, jax.random.PRNGKey(0))
    pipe_eval = make_seqpipe_eval_step(model, mesh, n_micro=2)
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    got = pipe_eval(state, xs, y)
    np.testing.assert_allclose(
        float(got["loss"]), float(ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(got["acc"]), float(ref["acc"]), rtol=1e-6
    )


def test_seqpipe_tp_rejects_indivisible_hidden():
    model = build_model(
        "LIF", (B, T, F), [H + 1, C], dropout=0.0, state_init="zeros",
    )
    mesh = make_seq_mesh(jax.devices()[:8], model=2)
    with pytest.raises(ValueError, match="divisible by the 'model'"):
        make_seqpipe_train_step(model, mesh)


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
