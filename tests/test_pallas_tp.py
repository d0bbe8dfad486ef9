"""In-kernel ICI collectives for tensor-parallel fused cells.

Runs the Pallas TPU interpret mode's multi-device simulation on the
virtual CPU mesh: remote DMAs + semaphores behave as on hardware ICI,
so the kernel-side all-gather / reduce-scatter building blocks are
pinned here exactly as the seqpipe collectives are pinned on the same
mesh. (Reference has no parallelism — SURVEY.md §2; this is TPU-native
substrate.)
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from sparch_tpu.ops import pallas_tp


@pytest.fixture(autouse=True)
def _reset_interpret_state():
    """The TPU interpret mode simulates cross-chip DMAs/semaphores through
    process-global state; stale state from a previous test's simulated
    mesh corrupts the next one (observed: NaN slots when the suite runs
    back-to-back but each test passes alone)."""
    from jax.experimental.pallas import tpu as pltpu

    pltpu.reset_tpu_interpret_mode_state()
    yield
    pltpu.reset_tpu_interpret_mode_state()


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("model",))


def _shmap(fn, mesh, in_specs, out_specs):
    return jax.jit(
        jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    )


try:  # JAX 0.9: jax.shard_map(check_vma=); older: check_rep
    jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _sm

    def _shmap(fn, mesh, in_specs, out_specs):  # noqa: F811
        return jax.jit(
            _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                check_rep=False)
        )


@pytest.mark.parametrize("num_devices", [2, 4])
def test_in_kernel_all_gather(num_devices):
    mesh = _mesh(num_devices)
    B, hloc, rounds = 8, 128, 3
    H = hloc * num_devices
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H), jnp.float32)

    fn = _shmap(
        functools.partial(
            pallas_tp.tp_all_gather, axis_name="model",
            num_devices=num_devices, rounds=rounds,
        ),
        mesh, P(None, "model"), P(None, None, None),
    )
    out = fn(x)  # replicated (rounds, B, H) — every chip gathered the same
    assert out.shape == (rounds, B, H)
    for r in range(rounds):
        # rounds accumulate +1 in-kernel: (x+1)+1 vs x+2 differ by one ulp
        np.testing.assert_allclose(
            np.asarray(out[r]), np.asarray(x) + r, rtol=0, atol=1e-5
        )


@pytest.mark.parametrize("num_devices", [2, 4])
def test_in_kernel_reduce_scatter(num_devices):
    mesh = _mesh(num_devices)
    B, hloc, rounds = 8, 128, 3
    H = hloc * num_devices
    # one distinct (B, H) partial per chip, stacked on a leading axis
    parts = jax.random.normal(
        jax.random.PRNGKey(1), (num_devices, B, H), jnp.float32
    )

    def per_shard(p):
        return pallas_tp.tp_reduce_scatter(
            p[0], axis_name="model", num_devices=num_devices, rounds=rounds,
        )

    fn = _shmap(per_shard, mesh, P("model", None, None),
                P(None, None, "model"))
    out = fn(parts)  # (rounds, B, H), rounds chained (see _rs_kernel)
    parts_np = np.asarray(parts)
    prev = None
    for r in range(rounds):
        if r == 0:
            stages = [parts_np[q] for q in range(num_devices)]
        else:
            stages = [
                parts_np[q] + prev[:, q * hloc : q * hloc + 1]
                for q in range(num_devices)
            ]
        prev = np.sum(np.stack(stages), axis=0)
        np.testing.assert_allclose(
            np.asarray(out[r]), prev, rtol=0, atol=1e-4
        )


def test_all_gather_distinct_shards():
    """Each chip contributes a DIFFERENT block; gather must place every
    block at its sender's column offset (catches any my-id/offset mixup
    the replicated-input test would miss)."""
    num_devices = 4
    mesh = _mesh(num_devices)
    B, hloc = 8, 128
    H = hloc * num_devices
    x = jnp.arange(B * H, dtype=jnp.float32).reshape(B, H)

    fn = _shmap(
        functools.partial(
            pallas_tp.tp_all_gather, axis_name="model",
            num_devices=num_devices, rounds=1,
        ),
        mesh, P(None, "model"), P(None, None, None),
    )
    out = fn(x)
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(x))


# ---------------------------------------------------------------------------
# TP fused cell kernels vs the scan cells (the semantic reference)
# ---------------------------------------------------------------------------

from sparch_tpu.ops import cells  # noqa: E402


def _quantize(x, scale=64.0):
    """Snap to multiples of 1/scale so any-order f32 sums are exact (and
    bf16-exact for |x| <= 1): spike trains then match bit-for-bit."""
    return jnp.round(x * scale) / scale


def _tp_inputs(key, B, T, H, adaptive):
    ks = jax.random.split(key, 8)
    Wx = jax.random.normal(ks[0], (B, T, H), jnp.float32) * 1.5
    alpha = jax.random.uniform(
        ks[1], (H,), minval=cells.ALPHA_LIM[0], maxval=cells.ALPHA_LIM[1]
    )
    V = _quantize(jax.random.normal(ks[2], (H, H), jnp.float32) * 0.3)
    V = jnp.clip(V, -1.0, 1.0)
    u0 = jax.random.uniform(ks[3], (B, H))
    s0 = jax.random.uniform(ks[4], (B, H))
    extra = {}
    if adaptive:
        extra = dict(
            beta=jax.random.uniform(
                ks[5], (H,), minval=cells.BETA_LIM[0],
                maxval=cells.BETA_LIM[1],
            ),
            a=jax.random.uniform(ks[6], (H,), minval=-1.0, maxval=1.0),
            b=jax.random.uniform(ks[7], (H,), minval=0.0, maxval=2.0),
            w0=jnp.zeros((B, H)),
        )
    return Wx, alpha, V, u0, s0, extra


def _tp_cell_caller(kind, mesh, nd, threshold, mxu_bf16=False):
    """Full-array function running the TP kernel sharded over 'model'."""

    def per_shard(Wx, alpha, V, u0, s0, *extras):
        if kind == "rlif":
            return pallas_tp.rlif_tp_pallas(
                Wx, alpha, V, threshold, u0, s0,
                axis_name="model", num_devices=nd, mxu_bf16=mxu_bf16,
            )
        beta, a, b, w0 = extras
        return pallas_tp.radlif_tp_pallas(
            Wx, alpha, beta, a, b, V, threshold, u0, w0, s0,
            axis_name="model", num_devices=nd, mxu_bf16=mxu_bf16,
        )

    n_extra = 0 if kind == "rlif" else 4
    extra_specs = (P("model"),) * 3 + (P(None, "model"),) if n_extra else ()
    return _shmap(
        per_shard, mesh,
        (P(None, None, "model"), P("model"), P(None, "model"),
         P(None, "model"), P(None, "model")) + extra_specs,
        P(None, None, "model"),
    )


def _oracle(kind, Wx, alpha, V, u0, s0, extra, threshold):
    if kind == "rlif":
        return cells.rlif_scan(Wx, alpha, V, threshold, u0, s0)
    return cells.radlif_scan(
        Wx, alpha, extra["beta"], extra["a"], extra["b"], V, threshold,
        u0, extra["w0"], s0,
    )


@pytest.mark.parametrize("kind", ["rlif", "radlif"])
@pytest.mark.parametrize("nd,T", [(2, 20), (4, 23)])
def test_tp_cell_forward_matches_scan(kind, nd, T):
    """TP fused forward == scan cells on the gathered arrays, bit-exact
    (V quantized so the sharded recurrent dot is order-independent).
    T=23 exercises the out-of-bounds tail chunk."""
    mesh = _mesh(nd)
    B, H = 8, 128 * nd
    threshold = 1.0
    Wx, alpha, V, u0, s0, extra = _tp_inputs(
        jax.random.PRNGKey(42), B, T, H, kind == "radlif"
    )
    fn = _tp_cell_caller(kind, mesh, nd, threshold)
    args = (Wx, alpha, V, u0, s0)
    if kind == "radlif":
        args += (extra["beta"], extra["a"], extra["b"], extra["w0"])
    s_tp = fn(*args)
    s_ref = _oracle(kind, Wx, alpha, V, u0, s0, extra, threshold)
    assert float(jnp.abs(s_ref).sum()) > 0, "degenerate case: no spikes"
    np.testing.assert_array_equal(np.asarray(s_tp), np.asarray(s_ref))


@pytest.mark.parametrize("kind", ["rlif", "radlif"])
@pytest.mark.parametrize("nd,T", [(2, 23), (4, 20)])
def test_tp_cell_grads_match_scan(kind, nd, T):
    """All gradients (Wx, alpha, [beta,a,b], V, u0, [w0], s0) of the TP
    kernel match the scan cells' autodiff through the same loss."""
    mesh = _mesh(nd)
    B, H = 8, 128 * nd
    threshold = 1.0
    Wx, alpha, V, u0, s0, extra = _tp_inputs(
        jax.random.PRNGKey(7), B, T, H, kind == "radlif"
    )
    R = jax.random.normal(jax.random.PRNGKey(9), (B, T, H), jnp.float32)
    fn = _tp_cell_caller(kind, mesh, nd, threshold)

    if kind == "rlif":
        args = (Wx, alpha, V, u0, s0)
        loss_tp = lambda *a: jnp.sum(fn(*a) * R)  # noqa: E731
        loss_ref = lambda Wx, alpha, V, u0, s0: jnp.sum(  # noqa: E731
            cells.rlif_scan(Wx, alpha, V, threshold, u0, s0) * R
        )
    else:
        args = (
            Wx, alpha, V, u0, s0,
            extra["beta"], extra["a"], extra["b"], extra["w0"],
        )
        loss_tp = lambda *a: jnp.sum(fn(*a) * R)  # noqa: E731

        def loss_ref(Wx, alpha, V, u0, s0, beta, a, b, w0):
            return jnp.sum(
                cells.radlif_scan(
                    Wx, alpha, beta, a, b, V, threshold, u0, w0, s0
                ) * R
            )

    argnums = tuple(range(len(args)))
    g_tp = jax.grad(loss_tp, argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums)(*args)
    names = ("Wx", "alpha", "V", "u0", "s0", "beta", "a", "b", "w0")
    for name, gt, gr in zip(names, g_tp, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gt), np.asarray(gr), rtol=0, atol=3e-5 * scale,
            err_msg=f"grad mismatch: {name}",
        )


def test_tp_cell_bf16_mode():
    """mxu_bf16 staging: 0/1 spikes and the quantized V are bf16-exact, so
    the forward stays bit-exact; the backward's bf16 D staging bounds the
    gradient agreement at the documented bf16-stream band."""
    nd, B, T = 4, 8, 20
    mesh = _mesh(nd)
    H = 128 * nd
    threshold = 1.0
    Wx, alpha, V, u0, s0, _ = _tp_inputs(
        jax.random.PRNGKey(3), B, T, H, False
    )
    # bf16-exact initial spikes (they ride the gather in f32, but keep the
    # case clean)
    s0 = jnp.round(s0)
    fn = _tp_cell_caller("rlif", mesh, nd, threshold, mxu_bf16=True)
    s_tp = fn(Wx, alpha, V, u0, s0)
    s_ref = cells.rlif_scan(Wx, alpha, V, threshold, u0, s0)
    np.testing.assert_array_equal(
        np.asarray(s_tp).astype(np.float32), np.asarray(s_ref)
    )
    R = jax.random.normal(jax.random.PRNGKey(5), (B, T, H), jnp.float32)
    g_tp = jax.grad(lambda *a: jnp.sum(fn(*a).astype(jnp.float32) * R),
                    (0, 2))(Wx, alpha, V, u0, s0)
    g_ref = jax.grad(
        lambda Wx, V: jnp.sum(
            cells.rlif_scan(Wx, alpha, V, threshold, u0, s0) * R
        ),
        (0, 1),
    )(Wx, V)
    for name, gt, gr in zip(("Wx", "V"), g_tp, g_ref):
        scale = max(float(jnp.abs(gr).max()), 1e-3)
        np.testing.assert_allclose(
            np.asarray(gt, dtype=np.float32), np.asarray(gr),
            rtol=0, atol=1.5e-2 * scale, err_msg=f"bf16 grad: {name}",
        )


def test_tp_cell_composed_dp_tp_mesh():
    """The MESH-dict device ids keep the exchanges inside each TP group
    when a data axis is composed in front (dp x tp 2x2)."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.array(devs[:4]).reshape(2, 2), ("data", "model"))
    nd, B, T = 2, 16, 20  # B=16: the data axis halves the per-shard batch
    H = 128 * nd
    threshold = 1.0
    Wx, alpha, V, u0, s0, _ = _tp_inputs(
        jax.random.PRNGKey(11), B, T, H, False
    )

    def per_shard(Wx, alpha, V, u0, s0):
        return pallas_tp.rlif_tp_pallas(
            Wx, alpha, V, threshold, u0, s0,
            axis_name="model", num_devices=nd,
        )

    fn = _shmap(
        per_shard, mesh,
        (P("data", None, "model"), P("model"), P(None, "model"),
         P("data", "model"), P("data", "model")),
        P("data", None, "model"),
    )
    s_tp = fn(Wx, alpha, V, u0, s0)
    s_ref = cells.rlif_scan(Wx, alpha, V, threshold, u0, s0)
    np.testing.assert_array_equal(np.asarray(s_tp), np.asarray(s_ref))


# ---------------------------------------------------------------------------
# Model-level integration: SNN(cell_impl='pallas_tp') == SNN(scan)
# ---------------------------------------------------------------------------

from sparch_tpu.models import build_model  # noqa: E402
from sparch_tpu.models.snn import SNN  # noqa: E402


def _quantize_V(variables):
    """Snap recurrent matrices to 1/64 grid so the sharded dot is
    order-exact (same trick as the kernel-level tests)."""
    import flax

    params = flax.core.unfreeze(variables["params"])
    for lname, leaves in params.items():
        if isinstance(leaves, dict) and "V" in leaves:
            leaves["V"] = _quantize(leaves["V"] * 3.0)
    out = dict(variables)
    out["params"] = flax.core.freeze(params)
    return out


@pytest.mark.parametrize("neuron,bidir,nd", [
    ("RadLIF", False, 4), ("RLIF", True, 2), ("LIF", False, 2),
    ("adLIF", False, 2),
])
def test_snn_pallas_tp_matches_scan(neuron, bidir, nd):
    """Full SNN forward + gradients with cell_impl='pallas_tp' match the
    scan model from identical variables/rngs (TP mesh; dropout and
    normalization live outside the TP kernels, so they are the exact
    same ops on both paths). Everything here must run JITTED: an eager
    backward dispatches the interpret-mode collectives one primitive at
    a time, and on a warm 1-vCPU process the simulator's device-barrier
    deadline expires mid-rendezvous (observed: passes alone, hard-aborts
    after a dozen prior tests in the same process)."""
    mesh = _mesh(nd)
    B, T, F, H, C = 8, 20, 40, 128 * nd, 20
    kw = dict(
        input_shape=(B, T, F), layer_sizes=[H, C], neuron_type=neuron,
        dropout=0.1, normalization="batchnorm", bidirectional=bidir,
        state_init="uniform",
    )
    scan_model = SNN(cell_impl="scan", **kw)
    tp_model = SNN(cell_impl="pallas_tp", tp_mesh=mesh,
                   tp_batch_axis=None, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F), jnp.float32)
    rngs = {"params": jax.random.PRNGKey(1), "state": jax.random.PRNGKey(2),
            "dropout": jax.random.PRNGKey(3)}
    variables = _quantize_V(scan_model.init(rngs, x, train=True))
    apply_rngs = {"state": jax.random.PRNGKey(4),
                  "dropout": jax.random.PRNGKey(5)}

    def run(model, variables):
        @jax.jit
        def fwd(variables):
            return model.apply(
                variables, x, train=True, rngs=apply_rngs,
                mutable=["batch_stats"],
            )

        (out, rates), updates = fwd(variables)
        return out, rates, updates

    out_s, rates_s, bs_s = run(scan_model, variables)
    out_t, rates_t, bs_t = run(tp_model, variables)
    np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_s),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(rates_t), np.asarray(rates_s))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
        ),
        bs_t, bs_s,
    )

    y = jax.random.randint(jax.random.PRNGKey(6), (B,), 0, C)

    def loss_fn(model):
        def f(params):
            vs = dict(variables)
            vs["params"] = params
            (out, rates), _ = model.apply(
                vs, x, train=True, rngs=apply_rngs,
                mutable=["batch_stats"],
            )
            ce = -jnp.mean(
                jax.nn.log_softmax(out)[jnp.arange(B), y]
            )
            return ce + 0.1 * jnp.sum(rates)
        return f

    g_s = jax.jit(jax.grad(loss_fn(scan_model)))(variables["params"])
    g_t = jax.jit(jax.grad(loss_fn(tp_model)))(variables["params"])

    flat_s = jax.tree_util.tree_flatten_with_path(g_s)[0]
    flat_t = jax.tree_util.tree_flatten_with_path(g_t)[0]
    for (path_s, a), (path_t, b) in zip(flat_s, flat_t):
        scale = max(float(jnp.abs(a).max()), 1e-4)
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=5e-5 * scale,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(path_s)}",
        )


def test_snn_pallas_tp_requires_mesh():
    model = SNN(input_shape=(8, 10, 4), layer_sizes=[256, 20],
                neuron_type="RLIF", cell_impl="pallas_tp")
    x = jnp.zeros((8, 10, 4))
    with pytest.raises(ValueError, match="tp_mesh"):
        model.init({"params": jax.random.PRNGKey(0),
                    "state": jax.random.PRNGKey(1)}, x, train=False)
