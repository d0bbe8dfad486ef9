"""Tensor-parallel fused ANN cells (RNN/LiGRU/GRU) vs the scan cells.

Same validation standard as the spiking TP kernels (test_pallas_tp.py):
the Pallas TPU interpret mode simulates the remote DMAs + semaphores
across the virtual CPU mesh devices, so the per-step in-kernel
all-gathers (including the GRU's two-exchange steps and the stacked
backward exchanges) are exercised with real cross-device dataflow.
Semantics: cells.{rnn,ligru,gru}_scan (reference anns.py:328-339,
449-462,581-595).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sparch_tpu.ops import cells, pallas_tp_ann


@pytest.fixture(autouse=True)
def _reset_interpret_state():
    """See test_pallas_tp.py: stale interpret-mode DMA/semaphore state
    from a previous simulated mesh corrupts the next one."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.reset_tpu_interpret_mode_state()
    yield
    pltpu.reset_tpu_interpret_mode_state()


def _mesh(n, axes=("model",)):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    if len(axes) == 1:
        return Mesh(np.array(devs[:n]), axes)
    return Mesh(np.array(devs[:n]).reshape(2, n // 2), axes)


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


_N_WX = {"rnn": 1, "ligru": 2, "gru": 3}
_SCAN = {"rnn": cells.rnn_scan, "ligru": cells.ligru_scan,
         "gru": cells.gru_scan}
_TP = {"rnn": pallas_tp_ann.rnn_tp_pallas,
       "ligru": pallas_tp_ann.ligru_tp_pallas,
       "gru": pallas_tp_ann.gru_tp_pallas}


def _inputs(key, B, T, H, mode):
    """Well-conditioned inputs: orthogonal*0.5 recurrent matrices keep
    the LiGRU's unbounded relu candidate from exploding (exploding
    states would amplify benign reduction-order noise into large
    absolute deviations and mask real bugs)."""
    n = _N_WX[mode]
    ks = jax.random.split(key, 2 * n + 1)
    wxs = [jax.random.normal(ks[i], (B, T, H), jnp.float32)
           for i in range(n)]
    vs = [jax.nn.initializers.orthogonal()(ks[n + i], (H, H)) * 0.5
          for i in range(n)]
    y0 = jax.random.uniform(ks[-1], (B, H))
    return wxs, vs, y0


def _tp_caller(mode, mesh, nd, mxu_bf16=False, batch_spec=None):
    n = _N_WX[mode]
    per_shard = functools.partial(
        _TP[mode], axis_name="model", num_devices=nd, mxu_bf16=mxu_bf16,
    )
    return _shmap(
        lambda *a: per_shard(*a), mesh,
        (P(batch_spec, None, "model"),) * n
        + (P(None, "model"),) * n
        + (P(batch_spec, "model"),),
        P(batch_spec, None, "model"),
    )


@pytest.mark.parametrize("mode", ["rnn", "ligru", "gru"])
@pytest.mark.parametrize("nd,T", [(2, 20), (4, 23)])
def test_tp_ann_forward_matches_scan(mode, nd, T):
    """TP fused forward == scan cells on the gathered arrays. T=23
    exercises the out-of-bounds tail chunk (gathers still run on dead
    steps; their garbage must never reach live outputs)."""
    mesh = _mesh(nd)
    B, H = 8, 128 * nd
    wxs, vs, y0 = _inputs(jax.random.PRNGKey(42), B, T, H, mode)
    fn = _tp_caller(mode, mesh, nd)
    y_tp = fn(*wxs, *vs, y0)
    y_ref = _SCAN[mode](*wxs, *vs, y0)
    scale = max(float(jnp.abs(y_ref).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=0, atol=2e-6 * scale
    )


@pytest.mark.parametrize("mode", ["rnn", "ligru", "gru"])
@pytest.mark.parametrize("nd,T", [(2, 23), (4, 20)])
def test_tp_ann_grads_match_scan(mode, nd, T):
    """All gradients (every Wx stream, every V, y0) of the TP kernel
    match the scan cells' autodiff through the same loss — including the
    stacked backward exchange layouts (LiGRU one 2-wide gather; GRU the
    dcpre gather + the [dzpre|drpre] stack)."""
    mesh = _mesh(nd)
    B, H = 8, 128 * nd
    wxs, vs, y0 = _inputs(jax.random.PRNGKey(7), B, T, H, mode)
    R = jax.random.normal(jax.random.PRNGKey(9), (B, T, H), jnp.float32)
    fn = _tp_caller(mode, mesh, nd)
    args = (*wxs, *vs, y0)
    argnums = tuple(range(len(args)))
    g_tp = jax.jit(
        jax.grad(lambda *a: jnp.sum(fn(*a) * R), argnums)
    )(*args)
    g_ref = jax.grad(
        lambda *a: jnp.sum(_SCAN[mode](*a) * R), argnums
    )(*args)
    n = _N_WX[mode]
    names = [f"wx{i}" for i in range(n)] + [f"v{i}" for i in range(n)] + [
        "y0"
    ]
    for name, gt, gr in zip(names, g_tp, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gr), rtol=0, atol=5e-6 * scale,
            err_msg=f"grad mismatch: {mode}/{name}",
        )


def test_tp_ann_bf16_mode():
    """mxu_bf16: bf16 wire/stream/resident-V staging bounds agreement at
    the documented bf16 band (~4e-3 relative on bounded gate outputs)."""
    nd, B, T = 4, 8, 20
    mesh = _mesh(nd)
    H = 128 * nd
    wxs, vs, y0 = _inputs(jax.random.PRNGKey(3), B, T, H, "gru")
    fn = _tp_caller("gru", mesh, nd, mxu_bf16=True)
    y_tp = fn(*wxs, *vs, y0)
    y_ref = cells.gru_scan(*wxs, *vs, y0)
    np.testing.assert_allclose(
        np.asarray(y_tp, dtype=np.float32), np.asarray(y_ref),
        rtol=0, atol=3e-2,
    )
    R = jax.random.normal(jax.random.PRNGKey(5), (B, T, H), jnp.float32)
    g_tp = jax.jit(jax.grad(
        lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * R), (0, 3)
    ))(*wxs, *vs, y0)
    g_ref = jax.grad(
        lambda wx, v: jnp.sum(
            cells.gru_scan(wx, wxs[1], wxs[2], v, vs[1], vs[2], y0) * R
        ),
        (0, 1),
    )(wxs[0], vs[0])
    for name, gt, gr in zip(("wx", "v"), g_tp, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gt, dtype=np.float32), np.asarray(gr),
            rtol=0, atol=2e-2 * scale, err_msg=f"bf16 grad: {name}",
        )


def test_tp_ann_composed_dp_tp_mesh():
    """Exchanges stay inside each TP group when a data axis is composed
    in front (dp x tp 2x2) — the MESH-dict device ids resolve per
    group."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", "model"))
    nd, B, T = 2, 16, 20
    H = 128 * nd
    wxs, vs, y0 = _inputs(jax.random.PRNGKey(11), B, T, H, "ligru")
    per_shard = functools.partial(
        pallas_tp_ann.ligru_tp_pallas, axis_name="model", num_devices=nd,
    )
    fn = _shmap(
        lambda *a: per_shard(*a), mesh,
        (P("data", None, "model"),) * 2 + (P(None, "model"),) * 2
        + (P("data", "model"),),
        P("data", None, "model"),
    )
    y_tp = fn(*wxs, *vs, y0)
    y_ref = cells.ligru_scan(*wxs, *vs, y0)
    np.testing.assert_allclose(
        np.asarray(y_tp), np.asarray(y_ref), rtol=0, atol=2e-6
    )


# ---------------------------------------------------------------------------
# Model-level integration: ANN(cell_impl='pallas_tp') == ANN(scan)
# ---------------------------------------------------------------------------

from sparch_tpu.models.ann import ANN  # noqa: E402


@pytest.mark.parametrize("ann_type,bidir,nd", [
    ("GRU", False, 4), ("LiGRU", True, 2), ("RNN", False, 2),
])
def test_ann_pallas_tp_matches_scan(ann_type, bidir, nd):
    """Full ANN forward + gradients with cell_impl='pallas_tp' match the
    scan model from identical variables/rngs (norm and dropout live
    outside the TP kernels, so both paths run the exact same ops there).
    Everything jitted — see test_pallas_tp.py for the eager-interpret
    caveat."""
    mesh = _mesh(nd)
    B, T, F, H, C = 8, 20, 40, 128 * nd, 20
    kw = dict(
        input_shape=(B, T, F), layer_sizes=[H, C], ann_type=ann_type,
        dropout=0.1, normalization="batchnorm", bidirectional=bidir,
    )
    scan_model = ANN(cell_impl="scan", **kw)
    tp_model = ANN(cell_impl="pallas_tp", tp_mesh=mesh,
                   tp_batch_axis=None, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(1),
            "dropout": jax.random.PRNGKey(3)}
    variables = scan_model.init(rngs, x, train=True)
    apply_rngs = {"dropout": jax.random.PRNGKey(5)}

    def run(model):
        @jax.jit
        def fwd(variables):
            return model.apply(
                variables, x, train=True, rngs=apply_rngs,
                mutable=["batch_stats"],
            )

        (out, _), updates = fwd(variables)
        return out, updates

    out_s, bs_s = run(scan_model)
    out_t, bs_t = run(tp_model)
    # kernel-level agreement is ~1e-6 (see the cases above); the model
    # output amplifies it through the readout Dense (sums H terms) and
    # the output batchnorm's 1/std — measured up to ~1e-4 at H=256
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s),
                               rtol=0, atol=3e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-5
        ),
        bs_t, bs_s,
    )

    y = jax.random.randint(jax.random.PRNGKey(6), (B,), 0, C)

    def loss_fn(model):
        def f(params):
            vs = dict(variables)
            vs["params"] = params
            (out, _), _ = model.apply(
                vs, x, train=True, rngs=apply_rngs,
                mutable=["batch_stats"],
            )
            return -jnp.mean(jax.nn.log_softmax(out)[jnp.arange(B), y])
        return f

    g_s = jax.jit(jax.grad(loss_fn(scan_model)))(variables["params"])
    g_t = jax.jit(jax.grad(loss_fn(tp_model)))(variables["params"])
    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(g_t)[0]
    for (path_s, a), (_, b) in zip(flat_s, flat_t):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=5e-5 * scale,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path_s)}",
        )


def test_ann_pallas_tp_requires_mesh():
    model = ANN(input_shape=(8, 10, 4), layer_sizes=[256, 20],
                ann_type="GRU", cell_impl="pallas_tp")
    x = jnp.zeros((8, 10, 4))
    with pytest.raises(ValueError, match="tp_mesh"):
        model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
