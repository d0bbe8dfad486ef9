"""Multi-device training on the virtual 8-CPU mesh: data-parallel steps
produce the same numerics as single-device, tensor-parallel placement
compiles and runs, ragged final batches work replicated."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sparch_tpu.models import build_model
from sparch_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    model_param_pspecs,
    replicate,
    shard_state,
)
from sparch_tpu.train.state import create_train_state
from sparch_tpu.train.steps import make_eval_step, make_train_step

B, T, F, C = 16, 10, 12, 4


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    y = np.arange(B) % C
    x = rng.random((B, T, F)).astype(np.float32)
    return jnp.asarray(x), jnp.asarray(y)


def test_mesh_shape():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(model=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(data=3, model=3)


def test_data_parallel_matches_single_device():
    x, y = _batch()
    model = build_model(
        "RadLIF", (B, T, F), [16, C], dropout=0.0, state_init="zeros"
    )
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)

    # single device
    s_single, m_single = step(state, x, y)

    # 8-way data parallel
    mesh = make_mesh()
    state_dp = replicate(state, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    s_dp, m_dp = step(state_dp, xs, ys)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_dp["loss"]), rtol=1e-5
    )
    for pa, pb in zip(
        jax.tree.leaves(s_single.params), jax.tree.leaves(s_dp.params)
    ):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_batchnorm_stats_are_global_under_dp():
    """Under jit global-view sharding, BN statistics are computed over the
    full (global) batch — not per-shard."""
    x, y = _batch(1)
    model = build_model(
        "LIF", (B, T, F), [16, C], dropout=0.0, state_init="zeros",
        normalization="batchnorm",
    )
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    step = make_train_step(model, donate=False)
    s_single, _ = step(state, x, y)

    mesh = make_mesh()
    s_dp, _ = step(
        replicate(state, mesh),
        jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(y, batch_sharding(mesh)),
    )
    for a, b in zip(
        jax.tree.leaves(s_single.batch_stats), jax.tree.leaves(s_dp.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tensor_parallel_placement_and_step():
    x, y = _batch(2)
    model = build_model(
        "RLIF", (B, T, F), [32, C], dropout=0.0, state_init="zeros"
    )
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_mesh(model=2)  # 4 x 2
    state_tp = shard_state(state, mesh, tensor_parallel=True)

    # hidden kernel is column-sharded over 'model'
    specs = model_param_pspecs(state.params)
    assert specs["layer_0"]["W"]["kernel"] == P(None, "model")
    assert specs["layer_0"]["V"] == P("model", None)
    assert specs["readout"]["W"]["kernel"] == P()

    step = make_train_step(model, donate=False)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    s2, metrics = step(state_tp, xs, ys)
    assert np.isfinite(float(metrics["loss"]))

    # numerics match the unsharded step
    s_ref, m_ref = step(state, x, y)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(m_ref["loss"]), rtol=1e-4
    )


def test_ragged_final_batch_replicated():
    x, y = _batch(3)
    x, y = x[:6], y[:6]  # 6 not divisible by 8
    model = build_model("LIF", (6, T, F), [8, C], state_init="zeros")
    state = create_train_state(model, x, lr=1e-2, rng=jax.random.PRNGKey(0))
    mesh = make_mesh()
    state = replicate(state, mesh)
    eval_step = make_eval_step(model)
    m = eval_step(state, replicate(x, mesh), replicate(y, mesh),
                  jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))


def test_maybe_initialize_initializes_before_backend_queries(monkeypatch):
    """On a pod, jax.distributed.initialize() must run before anything
    queries the runtime (jax.process_count() initializes the backend);
    the decision must come from env vars alone."""
    import sparch_tpu.parallel.multihost as mh

    calls = []
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "localhost:1234")
    monkeypatch.setattr(mh, "_initialized", False)
    monkeypatch.setattr(
        mh.jax.distributed, "initialize", lambda: calls.append("initialize")
    )
    monkeypatch.setattr(
        mh.jax, "process_count", lambda: calls.append("process_count") or 1
    )
    assert mh.maybe_initialize() is False  # fake process_count stays 1
    assert calls[0] == "initialize", calls
    assert calls == ["initialize", "process_count"]

    # second call must not re-initialize
    calls.clear()
    mh.maybe_initialize()
    assert calls == ["process_count"]


def test_maybe_initialize_noop_without_coordinator(monkeypatch):
    import sparch_tpu.parallel.multihost as mh

    calls = []
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(mh, "_initialized", False)
    monkeypatch.setattr(
        mh.jax.distributed, "initialize", lambda: calls.append("initialize")
    )
    assert mh.maybe_initialize() is False
    assert "initialize" not in calls


def test_pallas_tp_train_step_matches_scan():
    """The trainer wiring for cell_impl='pallas_tp': a full train step
    over a (data=1, model=2) mesh with v_cols state sharding matches the
    single-device scan step's loss/metrics (same param tree; the fused
    TP kernels run under the interpret-mode DMA simulation on the CPU
    mesh)."""
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(devices=devs[:2], model=2)

    H = 256  # 2 x 128-lane shards
    x, y = _batch(4)
    scan_model = build_model(
        "RadLIF", (B, T, F), [H, C], dropout=0.0, state_init="zeros",
        normalization="batchnorm", cell_impl="scan",
    )
    tp_model = build_model(
        "RadLIF", (B, T, F), [H, C], dropout=0.0, state_init="zeros",
        normalization="batchnorm", cell_impl="pallas_tp",
        tp_mesh=mesh, tp_axis="model", tp_batch_axis="data",
    )
    state = create_train_state(scan_model, x, lr=1e-2,
                               rng=jax.random.PRNGKey(0))

    # column-sharded V on the fused-TP path (the layout the kernel reads)
    specs = model_param_pspecs(state.params, v_cols=True)
    assert specs["layer_0"]["V"] == P(None, "model")

    state_tp = shard_state(state, mesh, tensor_parallel=True, v_cols=True)
    step_tp = make_train_step(tp_model, donate=False)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    s_tp, m_tp = step_tp(state_tp, xs, ys)

    step_ref = make_train_step(scan_model, donate=False)
    s_ref, m_ref = step_ref(state, x, y)

    np.testing.assert_allclose(
        float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(m_tp["spike_rate"]), float(m_ref["spike_rate"]), atol=1e-6
    )
    assert float(m_tp["acc"]) == float(m_ref["acc"])


def test_build_model_from_config_downgrades_pallas_tp():
    """Serving/migration rebuild from meta.json without a process mesh:
    a recorded cell_impl='pallas_tp' maps to 'auto' (same param tree)."""
    from sparch_tpu.models import build_model_from_config

    cfg = dict(
        model_type="RLIF", input_shape=(4, 6, 12), layer_sizes=[256, 4],
        normalization="batchnorm", use_bias=False, bidirectional=False,
        cell_impl="pallas_tp",
    )
    net = build_model_from_config(cfg)
    assert net.cell_impl == "auto"
    assert net.tp_mesh is None
