"""Whole-model forward parity against the actual reference implementation.

Imports the PyTorch reference from /root/reference (read-only, used purely
as a test oracle — none of its code ships in this package), copies weights
into the flax models, neutralises the reference's stochastic state init by
monkeypatching torch.rand to zeros (matching our state_init='zeros'), and
compares eval-mode forward outputs end to end.

Covers: SNN {LIF, adLIF, RLIF, RadLIF} x {batchnorm, layernorm, none} and
ANN {MLP, RNN, LiGRU, GRU}, unidirectional and bidirectional.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from sparch.models.anns import ANN as RefANN  # noqa: E402
from sparch.models.snns import SNN as RefSNN  # noqa: E402

from sparch_tpu.models import ANN, SNN  # noqa: E402

B, T, F, H, C = 3, 15, 10, 12, 4


@pytest.fixture(autouse=True)
def _zero_torch_rand(monkeypatch):
    """Reference inits hidden states with torch.rand each forward
    (snns.py:286-287); zero them to match our deterministic mode."""
    monkeypatch.setattr(
        torch, "rand", lambda *s, **k: torch.zeros(*s, **k)
    )


def _copy_linear(ref_linear, use_bias):
    p = {"kernel": jnp.asarray(ref_linear.weight.detach().numpy().T)}
    if use_bias:
        p["bias"] = jnp.asarray(ref_linear.bias.detach().numpy())
    return p


def _copy_norm(ref_layer, normalization):
    out = {}
    if normalization == "batchnorm":
        bn = ref_layer
        out["BatchNorm_0"] = {
            "scale": jnp.asarray(bn.weight.detach().numpy()),
            "bias": jnp.asarray(bn.bias.detach().numpy()),
        }
        stats = {
            "BatchNorm_0": {
                "mean": jnp.asarray(bn.running_mean.detach().numpy()),
                "var": jnp.asarray(bn.running_var.detach().numpy()),
            }
        }
        return out, stats
    if normalization == "layernorm":
        ln = ref_layer
        out["LayerNorm_0"] = {
            "scale": jnp.asarray(ln.weight.detach().numpy()),
            "bias": jnp.asarray(ln.bias.detach().numpy()),
        }
        return out, None
    return {}, None


def _snn_params_from_ref(ref, neuron_type, normalization, use_bias):
    params, stats = {}, {}
    n_layers = len(ref.snn)
    for i, lay in enumerate(ref.snn):
        is_readout = i == n_layers - 1
        name = "readout" if is_readout else f"layer_{i}"
        p = {"W": _copy_linear(lay.W, use_bias)}
        p["alpha"] = jnp.asarray(lay.alpha.detach().numpy())
        if not is_readout and neuron_type in ("adLIF", "RadLIF"):
            p["beta"] = jnp.asarray(lay.beta.detach().numpy())
            p["a"] = jnp.asarray(lay.a.detach().numpy())
            p["b"] = jnp.asarray(lay.b.detach().numpy())
        if not is_readout and neuron_type in ("RLIF", "RadLIF"):
            # torch cell computes st @ V.weight -> copy untransposed
            p["V"] = jnp.asarray(lay.V.weight.detach().numpy())
        if normalization in ("batchnorm", "layernorm"):
            norm_p, norm_s = _copy_norm(lay.norm, normalization)
            p["norm"] = norm_p
            if norm_s is not None:
                stats[name] = {"norm": norm_s}
        params[name] = p
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


@pytest.mark.parametrize("neuron_type", ["LIF", "adLIF", "RLIF", "RadLIF"])
@pytest.mark.parametrize("normalization", ["batchnorm", "layernorm", "none"])
def test_snn_forward_parity(neuron_type, normalization):
    torch.manual_seed(0)
    ref = RefSNN(
        input_shape=(B, T, F),
        layer_sizes=[H, H, C],
        neuron_type=neuron_type,
        dropout=0.0,
        normalization=normalization,
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
    ).eval()

    model = SNN(
        input_shape=(B, T, F),
        layer_sizes=(H, H, C),
        neuron_type=neuron_type,
        dropout=0.0,
        normalization=normalization,
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
        state_init="zeros",
    )
    variables = _snn_params_from_ref(ref, neuron_type, normalization, False)

    x = np.random.default_rng(0).random((B, T, F)).astype(np.float32) * 4.0
    with torch.no_grad():
        ref_out, ref_rates = ref(torch.from_numpy(x))
    out, rates = model.apply(variables, jnp.asarray(x), train=False)

    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), atol=2e-4,
        err_msg=f"{neuron_type}/{normalization} output mismatch",
    )
    np.testing.assert_allclose(
        np.asarray(rates), ref_rates.numpy(), atol=1e-5
    )


@pytest.mark.parametrize("neuron_type", ["LIF", "RadLIF"])
def test_snn_bidirectional_parity(neuron_type):
    torch.manual_seed(1)
    ref = RefSNN(
        input_shape=(B, T, F),
        layer_sizes=[H, C],
        neuron_type=neuron_type,
        dropout=0.0,
        normalization="none",
        use_bias=False,
        bidirectional=True,
        use_readout_layer=True,
    ).eval()
    model = SNN(
        input_shape=(B, T, F),
        layer_sizes=(H, C),
        neuron_type=neuron_type,
        dropout=0.0,
        normalization="none",
        use_bias=False,
        bidirectional=True,
        use_readout_layer=True,
        state_init="zeros",
    )
    variables = _snn_params_from_ref(ref, neuron_type, "none", False)
    x = np.random.default_rng(1).random((B, T, F)).astype(np.float32) * 4.0
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    out, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=2e-4)


def _ann_params_from_ref(ref, ann_type, normalization, use_bias):
    params, stats = {}, {}
    n_layers = len(ref.ann)
    for i, lay in enumerate(ref.ann):
        is_readout = i == n_layers - 1
        name = "readout" if is_readout else f"layer_{i}"
        p = {"W": _copy_linear(lay.W, use_bias)}
        if not is_readout:
            gates = {"RNN": ["V"], "LiGRU": ["V", "Vz"], "MLP": [],
                     "GRU": ["V", "Vz", "Vr"]}[ann_type]
            for g in gates:
                # torch applies self.V(y) = y @ V.weight.T -> transpose
                p[g] = jnp.asarray(
                    getattr(lay, g).weight.detach().numpy().T
                )
            for wname in ("Wz", "Wr"):
                if hasattr(lay, wname) and (
                    (ann_type == "LiGRU" and wname == "Wz")
                    or ann_type == "GRU"
                ):
                    p[wname] = _copy_linear(getattr(lay, wname), use_bias)
        if normalization in ("batchnorm", "layernorm"):
            norm_map = {"W": "norm"}
            if not is_readout and ann_type in ("LiGRU", "GRU"):
                norm_map["Wz"] = "normz"
            if not is_readout and ann_type == "GRU":
                norm_map["Wr"] = "normr"
            layer_stats = {}
            for mine, theirs in norm_map.items():
                norm_p, norm_s = _copy_norm(
                    getattr(lay, theirs), normalization
                )
                key = "norm" if is_readout else f"norm_{mine}"
                p[key] = norm_p
                if norm_s is not None:
                    layer_stats[key] = norm_s
            if layer_stats:
                stats[name] = layer_stats
        params[name] = p
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    return variables


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
@pytest.mark.parametrize("normalization", ["batchnorm", "none"])
def test_ann_forward_parity(ann_type, normalization):
    torch.manual_seed(2)
    ref = RefANN(
        input_shape=(B, T, F),
        layer_sizes=[H, H, C],
        ann_type=ann_type,
        dropout=0.0,
        normalization=normalization,
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
    ).eval()
    model = ANN(
        input_shape=(B, T, F),
        layer_sizes=(H, H, C),
        ann_type=ann_type,
        dropout=0.0,
        normalization=normalization,
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
    )
    variables = _ann_params_from_ref(ref, ann_type, normalization, False)
    x = np.random.default_rng(2).random((B, T, F)).astype(np.float32)
    with torch.no_grad():
        ref_out, _ = ref(torch.from_numpy(x))
    out, _ = model.apply(variables, jnp.asarray(x), train=False)
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), atol=5e-4,
        err_msg=f"{ann_type}/{normalization} output mismatch",
    )


@pytest.mark.parametrize("neuron_type", ["LIF", "adLIF", "RLIF", "RadLIF"])
def test_snn_gradient_parity(neuron_type):
    """Backward parity against the actual reference: with identical
    parameters and batch, every parameter gradient of the CE loss matches
    torch autograd to float32 noise (~1e-7 relative). This is the exact
    counterpart of the training-dynamics tests — those compare noisy
    end-to-end accuracy; this pins the gradients themselves, including the
    boxcar surrogate, clamping, zero-diagonal masking, and both readout
    recurrences."""
    import optax

    torch.manual_seed(0)
    ref = RefSNN(
        input_shape=(B, T, F),
        layer_sizes=[H, C],
        neuron_type=neuron_type,
        dropout=0.0,
        normalization="layernorm",
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
    ).train()
    model = SNN(
        input_shape=(B, T, F),
        layer_sizes=(H, C),
        neuron_type=neuron_type,
        dropout=0.0,
        normalization="layernorm",
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
        state_init="zeros",
        cell_impl="scan",
    )
    variables = _snn_params_from_ref(ref, neuron_type, "layernorm", False)
    rng = np.random.default_rng(0)
    x = (rng.random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    out, _ = ref(torch.from_numpy(x))
    loss_t = torch.nn.CrossEntropyLoss()(out, torch.from_numpy(y))
    ref.zero_grad()
    loss_t.backward()
    tgrads = {n: p.grad.detach().numpy() for n, p in ref.named_parameters()}

    def loss_fn(params):
        o, _ = model.apply({"params": params}, jnp.asarray(x), train=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            o, jnp.asarray(y)
        ).mean()

    np.testing.assert_allclose(
        float(loss_fn(variables["params"])), float(loss_t.detach()), rtol=1e-5
    )
    g = jax.grad(loss_fn)(variables["params"])

    def check(name, ours, theirs, transpose=False):
        o = np.asarray(ours)
        t = theirs.T if transpose else theirs
        denom = np.abs(t).max() + 1e-12
        np.testing.assert_allclose(
            o / denom, t / denom, atol=1e-5, err_msg=f"{neuron_type} {name}"
        )

    check("layer0.W", g["layer_0"]["W"]["kernel"], tgrads["snn.0.W.weight"],
          transpose=True)
    check("layer0.alpha", g["layer_0"]["alpha"], tgrads["snn.0.alpha"])
    if neuron_type in ("adLIF", "RadLIF"):
        for p in ("beta", "a", "b"):
            check(f"layer0.{p}", g["layer_0"][p], tgrads[f"snn.0.{p}"])
    if neuron_type in ("RLIF", "RadLIF"):
        check("layer0.V", g["layer_0"]["V"], tgrads["snn.0.V.weight"])
    check("readout.W", g["readout"]["W"]["kernel"], tgrads["snn.1.W.weight"],
          transpose=True)
    check("readout.alpha", g["readout"]["alpha"], tgrads["snn.1.alpha"])
    # layernorm params too
    check(
        "layer0.norm",
        g["layer_0"]["norm"]["LayerNorm_0"]["scale"],
        tgrads["snn.0.norm.weight"],
    )


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
def test_ann_gradient_parity(ann_type):
    """ANN counterpart of test_snn_gradient_parity: every parameter
    gradient of the CE loss matches torch autograd with identical
    parameters and batch (layernorm variant; scan cells)."""
    import optax

    torch.manual_seed(4)
    ref = RefANN(
        input_shape=(B, T, F),
        layer_sizes=[H, C],
        ann_type=ann_type,
        dropout=0.0,
        normalization="layernorm",
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
    ).train()
    model = ANN(
        input_shape=(B, T, F),
        layer_sizes=(H, C),
        ann_type=ann_type,
        dropout=0.0,
        normalization="layernorm",
        use_bias=False,
        bidirectional=False,
        use_readout_layer=True,
        cell_impl="scan",
    )
    variables = _ann_params_from_ref(ref, ann_type, "layernorm", False)
    rng = np.random.default_rng(4)
    x = rng.random((B, T, F)).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)

    out, _ = ref(torch.from_numpy(x))
    loss_t = torch.nn.CrossEntropyLoss()(out, torch.from_numpy(y))
    ref.zero_grad()
    loss_t.backward()
    tgrads = {n: p.grad.detach().numpy() for n, p in ref.named_parameters()}

    def loss_fn(params):
        o, _ = model.apply({"params": params}, jnp.asarray(x), train=True)
        return optax.softmax_cross_entropy_with_integer_labels(
            o, jnp.asarray(y)
        ).mean()

    np.testing.assert_allclose(
        float(loss_fn(variables["params"])), float(loss_t.detach()), rtol=1e-5
    )
    g = jax.grad(loss_fn)(variables["params"])

    def check(name, ours, theirs, transpose=False):
        o = np.asarray(ours)
        t = theirs.T if transpose else theirs
        denom = np.abs(t).max() + 1e-12
        np.testing.assert_allclose(
            o / denom, t / denom, atol=1e-5, err_msg=f"{ann_type} {name}"
        )

    check("layer0.W", g["layer_0"]["W"]["kernel"], tgrads["ann.0.W.weight"],
          transpose=True)
    gates = {"MLP": [], "RNN": ["V"], "LiGRU": ["V", "Vz"],
             "GRU": ["V", "Vz", "Vr"]}[ann_type]
    for gate in gates:
        check(f"layer0.{gate}", g["layer_0"][gate],
              tgrads[f"ann.0.{gate}.weight"], transpose=True)
    for wname in ("Wz", "Wr"):
        if f"ann.0.{wname}.weight" in tgrads:
            check(f"layer0.{wname}", g["layer_0"][wname]["kernel"],
                  tgrads[f"ann.0.{wname}.weight"], transpose=True)
    check("readout.W", g["readout"]["W"]["kernel"],
          tgrads["ann.1.W.weight"], transpose=True)
