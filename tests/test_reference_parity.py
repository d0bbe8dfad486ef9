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
