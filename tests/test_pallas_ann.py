"""Fused ANN-cell Pallas kernels vs the lax.scan oracles.

Runs in interpret mode on the CPU mesh (conftest forces jax_platforms=cpu);
the scan cells are themselves pinned against the torch reference by
tests/test_reference_parity.py, so agreement here transfers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparch_tpu.ops import cells, pallas_ann

B, T, H = 12, 27, 40  # deliberately unaligned: exercises padding + tail


@pytest.fixture(scope="module")
def data():
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    return {
        "Wx": jax.random.normal(ks[0], (B, T, H)) * 0.8,
        "Wzx": jax.random.normal(ks[1], (B, T, H)) * 0.8,
        "Wrx": jax.random.normal(ks[2], (B, T, H)) * 0.8,
        "V": jax.random.orthogonal(ks[3], H),
        "Vz": jax.random.orthogonal(ks[4], H),
        "Vr": jax.random.orthogonal(ks[5], H),
        "y0": jax.random.uniform(ks[6], (B, H)),
    }


def _pairs(d):
    return {
        "rnn": (
            lambda: cells.rnn_scan(d["Wx"], d["V"], d["y0"]),
            lambda: pallas_ann.rnn_pallas(d["Wx"], d["V"], d["y0"]),
        ),
        "ligru": (
            lambda: cells.ligru_scan(
                d["Wx"], d["Wzx"], d["V"], d["Vz"], d["y0"]
            ),
            lambda: pallas_ann.ligru_pallas(
                d["Wx"], d["Wzx"], d["V"], d["Vz"], d["y0"]
            ),
        ),
        "gru": (
            lambda: cells.gru_scan(
                d["Wx"], d["Wzx"], d["Wrx"],
                d["V"], d["Vz"], d["Vr"], d["y0"],
            ),
            lambda: pallas_ann.gru_pallas(
                d["Wx"], d["Wzx"], d["Wrx"],
                d["V"], d["Vz"], d["Vr"], d["y0"],
            ),
        ),
    }


@pytest.mark.parametrize("mode", ["rnn", "ligru", "gru"])
def test_forward_matches_scan(data, mode):
    scan_fn, pallas_fn = _pairs(data)[mode]
    np.testing.assert_allclose(
        np.asarray(pallas_fn()), np.asarray(scan_fn()), atol=2e-5
    )


_ARGNAMES = {
    "rnn": ("Wx", "V", "y0"),
    "ligru": ("Wx", "Wzx", "V", "Vz", "y0"),
    "gru": ("Wx", "Wzx", "Wrx", "V", "Vz", "Vr", "y0"),
}
_FNS = {
    "rnn": (cells.rnn_scan, pallas_ann.rnn_pallas),
    "ligru": (cells.ligru_scan, pallas_ann.ligru_pallas),
    "gru": (cells.gru_scan, pallas_ann.gru_pallas),
}


@pytest.mark.parametrize("mode", ["rnn", "ligru", "gru"])
def test_gradients_match_scan(data, mode):
    names = _ARGNAMES[mode]
    args = tuple(data[n] for n in names)
    scan_fn, pallas_fn = _FNS[mode]

    def loss(fn):
        def inner(*a):
            y = fn(*a)
            # non-uniform cotangent exercises every gradient path
            w = jnp.arange(y.size, dtype=y.dtype).reshape(y.shape) / y.size
            return (y * w).sum()

        return inner

    g_scan = jax.grad(loss(scan_fn), argnums=tuple(range(len(args))))(*args)
    g_pal = jax.grad(loss(pallas_fn), argnums=tuple(range(len(args))))(*args)
    for name, gs, gp in zip(names, g_scan, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gs), atol=3e-5, rtol=1e-4,
            err_msg=f"{mode} grad {name}",
        )


def test_aligned_shapes_no_tail(data):
    """T divisible by the chunk length and lane-aligned H."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    Wx = jax.random.normal(ks[0], (8, 30, 128))
    V = jax.random.orthogonal(ks[1], 128)
    y0 = jax.random.uniform(ks[2], (8, 128))
    want = cells.rnn_scan(Wx, V, y0)
    got = pallas_ann.rnn_pallas(Wx, V, y0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ann_model_pallas_impl_matches_scan(data):
    """Full ANN model with cell_impl='pallas' vs 'scan' (eval mode)."""
    from sparch_tpu.models import build_model

    x = jax.random.normal(jax.random.PRNGKey(0), (4, 19, 13))
    outs = {}
    for impl in ("scan", "pallas"):
        model = build_model(
            "LiGRU", (4, 19, 13), [24, 24, 6], dropout=0.0,
            normalization="batchnorm", cell_impl=impl,
        )
        variables = model.init({"params": jax.random.PRNGKey(1)}, x)
        out, _ = model.apply(variables, x)
        outs[impl] = np.asarray(out)
    np.testing.assert_allclose(outs["pallas"], outs["scan"], atol=2e-5)
