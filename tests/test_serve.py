"""Serving: batch Predictor shape/padding behaviour; streaming step-by-step
inference reproduces the batch forward exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparch_tpu.models import build_model
from sparch_tpu.serve import Predictor, streaming_init, streaming_step

B, T, F, C = 4, 11, 10, 5


def _model_and_vars(neuron_type="RadLIF", normalization="batchnorm",
                    bidirectional=False):
    model = build_model(
        neuron_type, (B, T, F), [16, C], dropout=0.0,
        normalization=normalization, state_init="zeros",
        bidirectional=bidirectional,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    # run one train pass so BN stats are non-trivial
    _, mut = model.apply(
        variables, x * 2.0, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    return model, {**variables, **mut}, x


def test_predictor_batching_and_padding():
    model, variables, x = _model_and_vars()
    pred = Predictor(model, variables, batch_size=3)  # forces padding
    labels, probs = pred(np.asarray(x))
    assert labels.shape == (B,)
    assert probs.shape == (B, C)
    np.testing.assert_allclose(probs.sum(axis=-1), np.ones(B), atol=1e-5)

    # agrees with a direct full-batch forward: the SNN readout already
    # emits a sum of per-step softmax posteriors, so the predictor
    # normalises by its mass rather than re-softmaxing the O(T) scores
    out, _ = model.apply(variables, x, train=False)
    want = np.asarray(out) / np.asarray(out).sum(-1, keepdims=True)
    np.testing.assert_allclose(want, probs, atol=1e-5)


def _seq_model_and_vars(model_type="RadLIF", bidirectional=False,
                        state_init="zeros"):
    """Shapes compatible with the 8-device CPU mesh: T divisible by the
    seq axis, batch by data x n_micro."""
    Bs, Ts, Fs, Hs = 8, 16, 10, 16
    model = build_model(
        model_type, (Bs, Ts, Fs), [Hs, C], dropout=0.0,
        normalization="batchnorm", state_init=state_init,
        bidirectional=bidirectional, cell_impl="scan",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (Bs, Ts, Fs))
    rngs = {"params": jax.random.PRNGKey(1)}
    if state_init == "uniform":
        rngs["state"] = jax.random.PRNGKey(3)
    variables = model.init(rngs, x)
    _, mut = model.apply(
        variables, x * 2.0, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2),
              **({"state": jax.random.PRNGKey(4)}
                 if state_init == "uniform" else {})},
    )
    return model, {**variables, **mut}, x


@pytest.mark.parametrize(
    "model_type,bidirectional",
    [("RadLIF", False), ("RadLIF", True), ("GRU", False)],
)
def test_seq_sharded_predictor_matches_single_chip(model_type,
                                                   bidirectional):
    """Predictor over a (data=2, seq=4) mesh returns the single-chip
    probabilities (f32 reduction-order tolerance), including through the
    batch-padding path (n not a multiple of batch_size)."""
    from sparch_tpu.parallel.seqpipe import make_seq_mesh

    model, variables, x = _seq_model_and_vars(model_type, bidirectional)
    single = Predictor(model, variables, batch_size=8)
    mesh = make_seq_mesh(jax.devices()[:8], data=2)
    sharded = Predictor(
        model, variables, batch_size=8, mesh=mesh, n_micro=2
    )
    l1, p1 = single(np.asarray(x))
    l2, p2 = sharded(np.asarray(x))
    np.testing.assert_allclose(p2, p1, atol=2e-5)
    np.testing.assert_array_equal(l2, l1)
    l3, p3 = sharded(np.asarray(x)[:6])  # pads 6 -> 8 inside
    np.testing.assert_allclose(p3, p1[:6], atol=2e-5)


def test_seq_sharded_predictor_uniform_init_deterministic():
    """'uniform' state init: the fixed per-predictor key keeps the mesh
    path deterministic call-to-call and across mesh layouts."""
    from sparch_tpu.parallel.seqpipe import make_seq_mesh

    model, variables, x = _seq_model_and_vars(state_init="uniform")
    outs = []
    for n_seq in (2, 8):
        mesh = make_seq_mesh(jax.devices()[:n_seq])
        pred = Predictor(
            model, variables, batch_size=8, mesh=mesh, n_micro=2, seed=9
        )
        outs.append(pred(np.asarray(x))[1])
        np.testing.assert_array_equal(pred(np.asarray(x))[1], outs[-1])
    np.testing.assert_allclose(outs[1], outs[0], atol=1e-5)


def test_seq_sharded_predictor_validation():
    from sparch_tpu.parallel.seqpipe import make_seq_mesh

    model, variables, x = _seq_model_and_vars()
    mesh = make_seq_mesh(jax.devices()[:8], data=2)
    with pytest.raises(ValueError, match="divisible by data axis"):
        Predictor(model, variables, batch_size=6, mesh=mesh, n_micro=4)
    import jax.sharding as shd

    no_seq = shd.Mesh(np.array(jax.devices()[:2]), ("data",))
    with pytest.raises(ValueError, match="no 'seq' axis"):
        Predictor(model, variables, batch_size=8, mesh=no_seq)
    pred = Predictor(model, variables, batch_size=8, mesh=mesh, n_micro=2)
    with pytest.raises(ValueError, match="not divisible by"):
        pred(np.asarray(x)[:, :13, :])  # T=13 vs seq axis 4


@pytest.mark.parametrize("neuron_type", ["LIF", "adLIF", "RLIF", "RadLIF"])
@pytest.mark.parametrize("normalization", ["batchnorm", "layernorm", "none"])
def test_streaming_matches_batch(neuron_type, normalization):
    model, variables, x = _model_and_vars(neuron_type, normalization)
    out_batch, _ = model.apply(variables, x, train=False)

    state = streaming_init(model, variables, batch_size=B)
    step = jax.jit(lambda s, xt: streaming_step(model, variables, s, xt))
    out = None
    for t in range(T):
        state, out = step(state, x[:, t, :])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_batch), atol=2e-4,
        err_msg=f"{neuron_type}/{normalization}",
    )
    assert int(state["t"]) == T


def test_frontend_streaming_matches_batch():
    """Device-frontend (FbankFrontend) models stream: feeding each
    frame's 400-sample waveform window (160-sample hop) reproduces the
    whole-utterance batch forward — the fbank DSP is frame-local."""
    import numpy as np

    from sparch_tpu.models import build_model
    from sparch_tpu.models.frontend import FbankFrontend

    n_frames = 9
    wav = np.random.default_rng(3).normal(
        size=(B, 400 + (n_frames - 1) * 160)
    ).astype(np.float32)
    inner = build_model(
        "adLIF", (B, None, 40), [16, C], dropout=0.0,
        normalization="batchnorm", state_init="zeros",
    )
    model = FbankFrontend(inner=inner)
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav,
                           train=False)
    out_batch, _ = model.apply(variables, wav, train=False)

    state = streaming_init(model, variables, batch_size=B)
    step = jax.jit(lambda s, w: streaming_step(model, variables, s, w))
    out = None
    for t in range(n_frames):
        window = wav[:, t * 160 : t * 160 + 400]
        state, out = step(state, window)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_batch), atol=2e-4
    )
    assert int(state["t"]) == n_frames


def test_predictor_input_contracts():
    """Misuse fails loudly: lengths on a feature model, pre-padded
    waveforms without lengths, mismatched lengths, over-long streaming
    windows; empty batches return empty results."""
    import numpy as np

    from sparch_tpu.models import build_model
    from sparch_tpu.models.frontend import FbankFrontend
    from sparch_tpu.serve import Predictor

    feat_model, feat_vars, x = _model_and_vars("LIF", "none")
    feat_pred = Predictor(feat_model, feat_vars, batch_size=B)
    with pytest.raises(ValueError, match="lengths"):
        feat_pred(np.asarray(x), lengths=[3] * B)
    labels, probs = feat_pred(np.zeros((0, T, F), np.float32))
    assert labels.shape == (0,) and probs.shape == (0, C)

    inner = build_model("LIF", (B, None, 40), [8, C], state_init="zeros",
                        normalization="none")
    model = FbankFrontend(inner=inner)
    wav = np.zeros((B, 400 + 160), np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, wav,
                           train=False)
    wav_pred = Predictor(model, variables, batch_size=B, pad_multiple=1)
    with pytest.raises(ValueError, match="lengths"):
        wav_pred(wav)  # pre-padded 2-D array without lengths
    with pytest.raises(ValueError, match="lengths"):
        wav_pred(wav, lengths=[560])  # count mismatch
    labels, probs = wav_pred(np.zeros((0, 560), np.float32))
    assert labels.shape == (0,) and probs.shape == (0, C)

    state = streaming_init(model, variables, batch_size=B)
    with pytest.raises(ValueError, match="window"):
        streaming_step(model, variables, state, wav)  # 560 > one window


def test_streaming_rejects_bidirectional():
    model, variables, _ = _model_and_vars(bidirectional=True)
    with pytest.raises(ValueError, match="Bidirectional"):
        streaming_init(model, variables, batch_size=B)


@pytest.mark.parametrize("ann_type", ["MLP", "RNN", "LiGRU", "GRU"])
@pytest.mark.parametrize("normalization", ["batchnorm", "none"])
def test_ann_streaming_matches_batch(ann_type, normalization):
    model = build_model(
        ann_type, (B, T, F), [16, C], dropout=0.0,
        normalization=normalization, cell_impl="scan",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x)
    _, mut = model.apply(
        variables, x * 2.0, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    variables = {**variables, **mut}
    out_batch, _ = model.apply(variables, x, train=False)

    state = streaming_init(model, variables, batch_size=B)
    step = jax.jit(lambda s, xt: streaming_step(model, variables, s, xt))
    out = None
    for t in range(T):
        state, out = step(state, x[:, t, :])
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_batch), atol=2e-4,
        err_msg=f"{ann_type}/{normalization}",
    )


def test_predictor_uniform_state_init():
    """The training default state_init='uniform' needs a 'state' RNG even
    in eval; the predictor supplies a fixed key (deterministic outputs)."""
    model = build_model(
        "LIF", (B, T, F), [16, C], dropout=0.0, state_init="uniform",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "state": jax.random.PRNGKey(2)}, x
    )
    pred = Predictor(model, variables, batch_size=B)
    labels1, probs1 = pred(np.asarray(x))
    labels2, probs2 = pred(np.asarray(x))
    np.testing.assert_array_equal(probs1, probs2)
    assert labels1.shape == (B,)
