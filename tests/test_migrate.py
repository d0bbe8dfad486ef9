"""Torch-checkpoint migration (sparch_tpu.migrate): converted reference
checkpoints must reproduce the reference's own forward and plug into the
native serving + fine-tune paths.

The torch reference from /root/reference is the oracle (read-only; its
trainer pickles whole modules — exp.py:462). Both checkpoint formats are
covered: pickled module (architecture from attributes) and bare
state_dict (architecture inferred from key/shape structure).
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")

from sparch.models.anns import ANN as RefANN  # noqa: E402
from sparch.models.snns import SNN as RefSNN  # noqa: E402

from sparch_tpu.migrate import (  # noqa: E402
    config_from_module,
    import_torch_checkpoint,
    infer_config_from_state_dict,
    variables_from_state_dict,
)

B, T, F, H, C = 3, 15, 10, 12, 4


def _ref_model(model_type, normalization="batchnorm", use_bias=False,
               bidirectional=False, layer_sizes=(H, H, C), seed=0,
               input_shape=(B, T, F), use_readout_layer=True):
    torch.manual_seed(seed)
    cls = (RefSNN if model_type in ("LIF", "adLIF", "RLIF", "RadLIF")
           else RefANN)
    kind = ("neuron_type" if cls is RefSNN else "ann_type")
    net = cls(**{
        "input_shape": input_shape, "layer_sizes": list(layer_sizes),
        kind: model_type, "dropout": 0.0,
        "normalization": normalization, "use_bias": use_bias,
        "bidirectional": bidirectional,
        "use_readout_layer": use_readout_layer,
    })
    return net.eval()


def _forward_match(net, config, variables, atol=2e-4):
    """Eval-forward parity, zero state init on both sides (the reference
    draws states with torch.rand each forward, snns.py:286-287)."""
    from sparch_tpu.models import build_model_from_config

    model = build_model_from_config(
        config, state_init="zeros", cell_impl="scan"
    )
    x = (np.random.default_rng(0)
         .random((B, T, config["input_shape"][-1])).astype(np.float32) * 4.0)
    orig_rand = torch.rand
    torch.rand = lambda *s, **k: torch.zeros(*s, **k)
    try:
        with torch.no_grad():
            ref_out, _ = net(torch.from_numpy(x))
    finally:
        torch.rand = orig_rand
    out = model.apply(variables, x, train=False)
    out = out[0] if isinstance(out, tuple) else out
    np.testing.assert_allclose(np.asarray(out), ref_out.numpy(), atol=atol)


CASES = [
    ("RadLIF", "batchnorm", True, False),
    ("adLIF", "layernorm", False, False),
    ("RLIF", "none", False, False),
    ("LIF", "batchnorm", False, True),
    ("GRU", "batchnorm", True, False),
    ("LiGRU", "none", False, True),
    ("RNN", "layernorm", False, False),
    ("MLP", "batchnorm", False, False),
]


@pytest.mark.parametrize("model_type,norm,use_bias,bidir", CASES)
def test_state_dict_conversion_forward_parity(model_type, norm, use_bias,
                                              bidir):
    """variables_from_state_dict reproduces the torch forward for every
    model family x norm x bias x direction combination."""
    net = _ref_model(model_type, norm, use_bias, bidir)
    config = config_from_module(net)
    variables = variables_from_state_dict(net.state_dict(), config)
    _forward_match(net, config, variables)


@pytest.mark.parametrize("model_type,norm,use_bias,bidir", CASES)
def test_infer_config_matches_module_attributes(model_type, norm, use_bias,
                                                bidir):
    """Architecture inference from state_dict structure alone agrees with
    the module's attributes on every inferable field."""
    net = _ref_model(model_type, norm, use_bias, bidir)
    truth = config_from_module(net)
    inferred = infer_config_from_state_dict(
        net.state_dict(), batch_size=truth["input_shape"][0]
    )
    for key in ("model_type", "input_shape", "layer_sizes", "normalization",
                "use_bias", "bidirectional", "use_readout_layer"):
        assert inferred[key] == truth[key], key


def test_module_checkpoint_to_experiment_folder(tmp_path):
    """Pickled-module .pth -> experiment folder -> Predictor serves it."""
    from sparch_tpu.serve import Predictor

    net = _ref_model("RadLIF", "batchnorm", False, False, seed=3)
    pth = str(tmp_path / "best_model.pth")
    torch.save(net, pth)

    out = str(tmp_path / "imported_exp")
    model, variables = import_torch_checkpoint(
        pth, out, sparch_path="/root/reference"
    )
    _forward_match(net, config_from_module(net), variables)
    assert os.path.isdir(os.path.join(out, "checkpoints", "best_model"))
    assert os.path.isfile(os.path.join(out, "checkpoints", "meta.json"))

    predictor = Predictor.from_experiment(out, batch_size=4)
    x = np.random.default_rng(1).random((5, T, F)).astype(np.float32)
    labels, probs = predictor(x)
    assert labels.shape == (5,) and probs.shape == (5, C)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)


def test_state_dict_checkpoint_import(tmp_path):
    """torch.save(net.state_dict(), ...) imports via structure inference;
    non-inferable fields come from config_overrides."""
    net = _ref_model("GRU", "batchnorm", False, False, seed=4)
    pth = str(tmp_path / "sd.pth")
    torch.save(net.state_dict(), pth)

    out = str(tmp_path / "imported_sd")
    _, variables = import_torch_checkpoint(
        pth, out, config_overrides={"batch_size": B}
    )
    _forward_match(net, config_from_module(net), variables)


def test_cli_tool_with_verify(tmp_path):
    """The tools/ wrapper end-to-end, including its --verify parity gate."""
    sys.path.insert(0, "/root/repo/tools")
    try:
        import import_torch_checkpoint as cli
    finally:
        sys.path.pop(0)

    net = _ref_model("adLIF", "layernorm", False, False, seed=5)
    pth = str(tmp_path / "best_model.pth")
    torch.save(net, pth)
    out = str(tmp_path / "cli_exp")
    rc = cli.main([pth, out, "--sparch_path", "/root/reference", "--verify"])
    assert rc == 0


def test_finetune_imported_checkpoint_via_cli(shd_folder, tmp_path):
    """run_exp.py --use_pretrained_model 1 --load_exp_folder <imported>:
    a reference-trained model fine-tunes in the native trainer (SHD has
    700 units / 20 classes, reference spiking_datasets.py)."""
    import run_exp

    net = _ref_model("LIF", "batchnorm", False, False,
                     layer_sizes=(16, 20), input_shape=(8, 50, 700), seed=6)
    pth = str(tmp_path / "best_model.pth")
    torch.save(net, pth)
    imported = str(tmp_path / "imported")
    import_torch_checkpoint(pth, imported, sparch_path="/root/reference")

    exp = str(tmp_path / "finetune")
    e = run_exp.main([
        "--dataset_name", "shd",
        "--data_folder", shd_folder,
        "--new_exp_folder", exp,
        "--model_type", "LIF",
        "--nb_layers", "2",
        "--nb_hiddens", "16",
        "--batch_size", "8",
        "--nb_epochs", "1",
        "--state_init", "zeros",
        "--pdrop", "0.0",
        "--use_pretrained_model", "true",
        "--load_exp_folder", imported,
    ])
    assert 0.0 <= e.test_acc <= 1.0


def test_trained_module_conversion(tmp_path):
    """A module that has actually TRAINED (torch Adam steps) converts
    faithfully: drifted weights and non-init batchnorm running stats
    round-trip (untrained modules would mask a running-stat mapping bug
    behind mean=0/var=1 defaults)."""
    net = _ref_model("RadLIF", "batchnorm", False, False, seed=10)
    net.train()
    opt = torch.optim.Adam(net.parameters(), lr=1e-2)
    loss_fn = torch.nn.CrossEntropyLoss()
    gen = torch.Generator().manual_seed(0)
    for _ in range(5):
        x = torch.rand((B, T, F), generator=gen) * 4.0
        y = torch.randint(0, C, (B,), generator=gen)
        out, _ = net(x)
        loss = loss_fn(out, y)
        opt.zero_grad()
        loss.backward()
        opt.step()
    net.eval()
    # training moved the running stats off their init values
    bn_var = net.snn[0].norm.running_var.detach().numpy()
    assert np.abs(bn_var - 1.0).max() > 1e-3

    config = config_from_module(net)
    variables = variables_from_state_dict(net.state_dict(), config)
    assert "batch_stats" in variables
    _forward_match(net, config, variables)


def test_string_boolean_overrides(tmp_path):
    """CLI --set writes string values; boolean config fields must accept
    'false'/'true' spellings (bool('false') is True — a silent corruption
    if merged verbatim: use_readout_layer='false' would remap layers)."""
    net = _ref_model("RadLIF", "none", False, False, seed=7,
                     use_readout_layer=False)
    sd = net.state_dict()
    cfg = infer_config_from_state_dict(sd, use_readout_layer="false")
    assert cfg["use_readout_layer"] is False
    # headless stack: every index maps to layer_{i}, none to 'readout'
    variables = variables_from_state_dict(sd, cfg)
    assert set(variables["params"]) == {"layer_0", "layer_1", "layer_2"}
    with pytest.raises(ValueError, match="not a boolean"):
        infer_config_from_state_dict(sd, use_bias="maybe")


def test_module_path_overrides_interpreted(tmp_path):
    """config_overrides mean the same thing for module checkpoints as for
    state_dicts: batch_size targets input_shape[0], not a stray key."""
    net = _ref_model("LIF", "none", False, False, seed=8)
    pth = str(tmp_path / "m.pth")
    torch.save(net, pth)
    out = str(tmp_path / "exp_bs")
    import_torch_checkpoint(
        pth, out, sparch_path="/root/reference",
        config_overrides={"batch_size": 32},
    )
    import json

    with open(os.path.join(out, "checkpoints", "meta.json")) as f:
        cfg = json.load(f)["model"]
    assert cfg["input_shape"][0] == 32
    assert "batch_size" not in cfg


def test_serving_meta_without_prng_impl(tmp_path):
    """Experiment folders written before prng_impl was recorded in meta
    still load: the serve template falls back to trying each CLI impl."""
    import json

    from sparch_tpu.serve import Predictor

    net = _ref_model("LIF", "batchnorm", False, False, seed=9)
    pth = str(tmp_path / "m.pth")
    torch.save(net, pth)
    out = str(tmp_path / "legacy_exp")
    import_torch_checkpoint(pth, out, sparch_path="/root/reference",
                            prng_impl="threefry2x32")
    meta_path = os.path.join(out, "checkpoints", "meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    del meta["model"]["prng_impl"]  # simulate a pre-upgrade meta
    with open(meta_path, "w") as f:
        json.dump(meta, f)

    predictor = Predictor.from_experiment(out, batch_size=4)
    x = np.random.default_rng(2).random((3, T, F)).astype(np.float32)
    labels, probs = predictor(x)
    assert labels.shape == (3,)


@pytest.fixture
def shd_folder(tmp_path_factory):
    from .fixtures import make_shd_h5

    folder = str(tmp_path_factory.mktemp("shd_migrate"))
    make_shd_h5(f"{folder}/shd_train.h5", n=16, nb_classes=3)
    make_shd_h5(f"{folder}/shd_test.h5", n=8, nb_classes=3, seed=1)
    return folder
