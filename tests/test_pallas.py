"""Fused Pallas cells (interpret mode on CPU): forward matches the scan
cells exactly; gradients flow through the custom_vjp and match the scan
gradients; padding to TPU tiles never produces phantom spikes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparch_tpu.ops import cells, pallas_cells

B, T, H = 4, 7, 24  # deliberately unaligned to the (8, 128) tile


def _rand(key, *shape, lo=-2.0, hi=2.0):
    return jax.random.uniform(jax.random.PRNGKey(key), shape, jnp.float32, lo, hi)


@pytest.fixture
def data():
    return dict(
        Wx=_rand(0, B, T, H, lo=-3.0, hi=3.0),
        alpha=_rand(1, H, lo=0.82, hi=0.96),
        beta=_rand(2, H, lo=0.97, hi=0.99),
        a=_rand(3, H, lo=-1.0, hi=1.0),
        b=_rand(4, H, lo=0.0, hi=2.0),
        V=_rand(5, H, H, lo=-0.5, hi=0.5),
        u0=_rand(6, B, H, lo=0.0, hi=1.0),
        w0=_rand(7, B, H, lo=0.0, hi=1.0),
        s0=(jnp.abs(_rand(8, B, H)) > 1.0).astype(jnp.float32),
    )


def test_lif_pallas_matches_scan(data):
    d = data
    got = pallas_cells.lif_pallas(d["Wx"], d["alpha"], 1.0, d["u0"], d["s0"])
    want = cells.lif_scan(d["Wx"], d["alpha"], 1.0, d["u0"], d["s0"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_adlif_pallas_matches_scan(data):
    d = data
    got = pallas_cells.adlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    want = cells.adlif_scan(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_rlif_pallas_matches_scan(data):
    d = data
    got = pallas_cells.rlif_pallas(
        d["Wx"], d["alpha"], d["V"], 1.0, d["u0"], d["s0"]
    )
    want = cells.rlif_scan(d["Wx"], d["alpha"], d["V"], 1.0, d["u0"], d["s0"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_radlif_pallas_matches_scan(data):
    d = data
    got = pallas_cells.radlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    want = cells.radlif_scan(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gradients_match_scan(data):
    d = data

    def loss_pallas(Wx, alpha, V):
        s = pallas_cells.rlif_pallas(Wx, alpha, V, 0.5, d["u0"], d["s0"])
        return (s * jnp.arange(H)).sum()

    def loss_scan(Wx, alpha, V):
        s = cells.rlif_scan(Wx, alpha, V, 0.5, d["u0"], d["s0"])
        return (s * jnp.arange(H)).sum()

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(d["Wx"], d["alpha"], d["V"])
    gs = jax.grad(loss_scan, argnums=(0, 1, 2))(d["Wx"], d["alpha"], d["V"])
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    # diagonal of dV still zero through the pallas path
    np.testing.assert_array_equal(np.diag(np.asarray(gp[2])), np.zeros(H))


def test_padding_produces_no_phantom_spikes(data):
    """Outputs are sliced back to (B,T,H); check total spike counts agree
    with scan so padded rows/neurons cannot leak in."""
    d = data
    got = pallas_cells.radlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    want = cells.radlif_scan(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    assert float(jnp.sum(got)) == float(jnp.sum(want))


def test_model_with_pallas_impl(data):
    from sparch_tpu.models import build_model

    x = _rand(10, B, T, 12, lo=0.0, hi=2.0)
    model = build_model(
        "RadLIF", (B, T, 12), [16, 5], dropout=0.0, state_init="zeros",
        cell_impl="pallas",
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    out, rates = model.apply(variables, x, train=False)
    assert out.shape == (B, 5)

    ref_model = build_model(
        "RadLIF", (B, T, 12), [16, 5], dropout=0.0, state_init="zeros",
        cell_impl="scan",
    )
    out_ref, _ = ref_model.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)


@pytest.mark.parametrize("variant", ["lif", "adlif", "rlif", "radlif"])
def test_all_param_gradients_match_scan(data, variant):
    """Fused Pallas backward vs scan autodiff: gradients w.r.t. every
    operand (Wx, alpha, beta, a, b, V, u0, w0, s0) for every cell type."""
    d = data
    thr = 0.8

    if variant == "lif":
        def f_pl(Wx, alpha, u0, s0):
            return pallas_cells.lif_pallas(Wx, alpha, thr, u0, s0)

        def f_sc(Wx, alpha, u0, s0):
            return cells.lif_scan(Wx, alpha, thr, u0, s0)

        args = (d["Wx"], d["alpha"], d["u0"], d["s0"])
    elif variant == "adlif":
        def f_pl(Wx, alpha, beta, a, b, u0, w0, s0):
            return pallas_cells.adlif_pallas(
                Wx, alpha, beta, a, b, thr, u0, w0, s0
            )

        def f_sc(Wx, alpha, beta, a, b, u0, w0, s0):
            return cells.adlif_scan(Wx, alpha, beta, a, b, thr, u0, w0, s0)

        args = (d["Wx"], d["alpha"], d["beta"], d["a"], d["b"],
                d["u0"], d["w0"], d["s0"])
    elif variant == "rlif":
        def f_pl(Wx, alpha, V, u0, s0):
            return pallas_cells.rlif_pallas(Wx, alpha, V, thr, u0, s0)

        def f_sc(Wx, alpha, V, u0, s0):
            return cells.rlif_scan(Wx, alpha, V, thr, u0, s0)

        args = (d["Wx"], d["alpha"], d["V"], d["u0"], d["s0"])
    else:
        def f_pl(Wx, alpha, beta, a, b, V, u0, w0, s0):
            return pallas_cells.radlif_pallas(
                Wx, alpha, beta, a, b, V, thr, u0, w0, s0
            )

        def f_sc(Wx, alpha, beta, a, b, V, u0, w0, s0):
            return cells.radlif_scan(
                Wx, alpha, beta, a, b, V, thr, u0, w0, s0
            )

        args = (d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"],
                d["u0"], d["w0"], d["s0"])

    # weighted loss so cotangents vary per step/neuron
    wgt = jnp.asarray(
        np.linspace(0.5, 1.5, T)[None, :, None]
        * np.linspace(1.0, 2.0, H)[None, None, :],
        jnp.float32,
    )

    def loss(f):
        def inner(*a):
            return (f(*a) * wgt).sum()

        return inner

    n = len(args)
    gp = jax.grad(loss(f_pl), argnums=tuple(range(n)))(*args)
    gs = jax.grad(loss(f_sc), argnums=tuple(range(n)))(*args)
    for i, (x, y) in enumerate(zip(gp, gs)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-3, rtol=1e-4,
            err_msg=f"{variant} grad argnum {i}",
        )


def test_mxu_bf16_mode_close_to_f32(data):
    d = data
    f32 = pallas_cells.radlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    bf16 = pallas_cells.radlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], d["V"], 1.0,
        d["u0"], d["w0"], d["s0"], mxu_bf16=True,
    )
    # spikes are binary; bf16 recurrent drive may flip near-threshold
    # neurons, but the overwhelming majority must agree
    agree = float(jnp.mean(f32 == bf16))
    assert agree > 0.99, agree

    def loss(fn):
        def inner(V):
            s = fn(d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], V, 1.0,
                   d["u0"], d["w0"], d["s0"])
            return (s * jnp.arange(H)).sum()
        return inner

    import functools
    g32 = jax.grad(loss(pallas_cells.radlif_pallas))(d["V"])
    g16 = jax.grad(loss(functools.partial(
        pallas_cells.radlif_pallas, mxu_bf16=True)))(d["V"])
    denom = float(jnp.abs(g32).max())
    rel = float(jnp.abs(g32 - g16).max()) / max(denom, 1e-9)
    assert rel < 0.1, rel


def test_nonrecurrent_bf16_streams_exact_forward(data):
    """lif/adlif with bf16 streams: spikes are 0/1 (exactly representable
    in bf16) and there is no MXU product, so the forward must equal the
    f32 scan EXACTLY; the dWx gradient rounds within bf16 tolerance."""
    d = data
    got = pallas_cells.adlif_pallas(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], 1.0,
        d["u0"], d["w0"], d["s0"], mxu_bf16=True,
    )
    want = cells.adlif_scan(
        d["Wx"], d["alpha"], d["beta"], d["a"], d["b"], 1.0,
        d["u0"], d["w0"], d["s0"],
    )
    assert got.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want)
    )

    def loss(fn, **kw):
        def inner(Wx, alpha):
            s = fn(Wx, alpha, 1.0, d["u0"], d["s0"], **kw)
            return (s.astype(jnp.float32) * jnp.arange(H)).sum()
        return inner

    g16 = jax.grad(loss(pallas_cells.lif_pallas, mxu_bf16=True),
                   argnums=(0, 1))(d["Wx"], d["alpha"])
    g32 = jax.grad(loss(cells.lif_scan), argnums=(0, 1))(d["Wx"], d["alpha"])
    for a, b in zip(g16, g32):
        denom = float(jnp.abs(b).max()) + 1e-9
        assert float(jnp.abs(a.astype(jnp.float32) - b).max()) / denom < 0.02


def test_readout_pallas_matches_scan(data):
    d = data
    Wx = d["Wx"]
    alpha = d["alpha"]
    u0 = d["u0"]
    got = pallas_cells.readout_pallas(Wx, alpha, u0)
    want = cells.readout_sum(Wx, alpha, u0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # gradients (weighted loss over classes)
    wgt = jnp.asarray(np.linspace(0.5, 2.0, H)[None, :], jnp.float32)

    def loss(fn):
        return lambda Wx, alpha, u0: (fn(Wx, alpha, u0) * wgt).sum()

    gp = jax.grad(loss(pallas_cells.readout_pallas), argnums=(0, 1, 2))(
        Wx, alpha, u0
    )
    gs = jax.grad(loss(cells.readout_sum), argnums=(0, 1, 2))(Wx, alpha, u0)
    for i, (x, y) in enumerate(zip(gp, gs)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-4,
            err_msg=f"readout grad argnum {i}",
        )


def test_affine_fold_matches_scan(data):
    """The normalization affine folded into the kernel (drive =
    scale*Wx + shift) must match applying the affine outside the scan,
    for values and for gradients w.r.t. every operand incl. scale/shift."""
    d = data
    scale = _rand(20, H, lo=0.5, hi=1.5)
    shift = _rand(21, H, lo=-0.3, hi=0.3)

    def f_pl(Wx, scale, shift, alpha, beta, a, b, V, u0, w0, s0):
        return pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, u0, w0, s0,
            scale=scale, shift=shift,
        )

    def f_sc(Wx, scale, shift, alpha, beta, a, b, V, u0, w0, s0):
        return cells.radlif_scan(
            scale * Wx + shift, alpha, beta, a, b, V, 1.0, u0, w0, s0
        )

    args = (d["Wx"], scale, shift, d["alpha"], d["beta"], d["a"], d["b"],
            d["V"], d["u0"], d["w0"], d["s0"])
    got = f_pl(*args)
    want = f_sc(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    wgt = jnp.asarray(
        np.linspace(0.5, 1.5, T)[None, :, None]
        * np.linspace(1.0, 2.0, H)[None, None, :],
        jnp.float32,
    )
    n = len(args)
    gp = jax.grad(lambda *a: (f_pl(*a) * wgt).sum(), argnums=tuple(range(n)))(*args)
    gs = jax.grad(lambda *a: (f_sc(*a) * wgt).sum(), argnums=tuple(range(n)))(*args)
    names = ["Wx", "scale", "shift", "alpha", "beta", "a", "b", "V",
             "u0", "w0", "s0"]
    for nm, x, y in zip(names, gp, gs):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=2e-3, rtol=1e-4,
            err_msg=f"affine-fold grad {nm}",
        )


def test_model_affine_fold_matches_apply_norm(data):
    """Full model: pallas path (BN folded into the kernel) vs scan path
    (BN applied) on identical variables, train and eval mode."""
    from sparch_tpu.models import build_model

    x = _rand(11, B, T, 12, lo=0.0, hi=2.0)
    kw = dict(dropout=0.0, state_init="zeros", normalization="batchnorm")
    pallas_model = build_model("RadLIF", (B, T, 12), [16, 5],
                               cell_impl="pallas", **kw)
    scan_model = build_model("RadLIF", (B, T, 12), [16, 5],
                             cell_impl="scan", **kw)
    variables = scan_model.init({"params": jax.random.PRNGKey(0)}, x)

    for train in (False, True):
        kwargs = dict(mutable=["batch_stats"]) if train else {}
        out_p = pallas_model.apply(variables, x, train=train, **kwargs)
        out_s = scan_model.apply(variables, x, train=train, **kwargs)
        if train:
            (o_p, _), stats_p = out_p
            (o_s, _), stats_s = out_s
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-5
                ),
                stats_p, stats_s,
            )
        else:
            o_p, _ = out_p
            o_s, _ = out_s
        np.testing.assert_allclose(
            np.asarray(o_p), np.asarray(o_s), atol=1e-4,
            err_msg=f"train={train}",
        )


def test_fused_dropout_properties():
    """In-kernel dropout: deterministic per seed, values in {0, s/(1-p)},
    dropped fraction ~= p among fired spikes, seed changes the mask."""
    Bq, Tq, Hq = 16, 32, 48
    alpha = jnp.linspace(0.83, 0.95, Hq)
    alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
    # drive pinning u at exactly 1.2: every neuron fires every step
    wx_row = 1.2 + alpha_c / (1.0 - alpha_c)
    Wx = jnp.broadcast_to(wx_row, (Bq, Tq, Hq)).astype(jnp.float32)
    u0 = jnp.full((Bq, Hq), 1.2, jnp.float32)
    s0 = jnp.ones((Bq, Hq), jnp.float32)
    seed = jnp.array([42, 7], jnp.int32)
    p = 0.25
    args = (Wx, alpha, 1.0, u0, s0)
    drp = np.asarray(
        pallas_cells.lif_pallas(*args, drop_rate=p, drop_seed=seed)
    )
    drp2 = np.asarray(
        pallas_cells.lif_pallas(*args, drop_rate=p, drop_seed=seed)
    )
    np.testing.assert_array_equal(drp, drp2)  # deterministic
    # every raw spike fired, so values are exactly {0, 1/(1-p)}
    vals = np.unique(drp)
    np.testing.assert_allclose(vals, [0.0, 1.0 / (1.0 - p)], rtol=1e-6)
    frac = float((drp == 0.0).mean())
    assert abs(frac - p) < 0.02, frac  # 24576 samples
    drp3 = np.asarray(
        pallas_cells.lif_pallas(
            *args, drop_rate=p, drop_seed=jnp.array([43, 7], jnp.int32)
        )
    )
    assert not np.array_equal(drp, drp3)  # seed-dependent


def test_fused_dropout_gradients_match_masked_oracle():
    """With every neuron firing inside the surrogate window, the realized
    keep mask is fully recoverable from the dropped output, so the fused
    backward can be checked against scan-autodiff through an explicit
    mask multiply."""
    Bq, Tq, Hq = 8, 24, 16
    alpha = jnp.linspace(0.83, 0.95, Hq)
    alpha_c = jnp.clip(alpha, *cells.ALPHA_LIM)
    # drive that pins u at exactly 1.2: spikes every step, window = 1
    wx_row = 1.2 + alpha_c / (1.0 - alpha_c)
    Wx = jnp.broadcast_to(wx_row, (Bq, Tq, Hq)).astype(jnp.float32)
    u0 = jnp.full((Bq, Hq), 1.2, jnp.float32)
    s0 = jnp.ones((Bq, Hq), jnp.float32)
    p = 0.3
    seed = jnp.array([5, 11], jnp.int32)

    out = pallas_cells.lif_pallas(
        Wx, alpha, 1.0, u0, s0, drop_rate=p, drop_seed=seed
    )
    mask = (np.asarray(out) > 0).astype(np.float32)
    assert 0.05 < 1.0 - mask.mean() < 0.6  # real dropping happened
    mask = jnp.asarray(mask)

    wgt = jnp.asarray(
        np.linspace(0.5, 1.5, Tq)[None, :, None]
        * np.linspace(1.0, 2.0, Hq)[None, None, :],
        jnp.float32,
    )

    def loss_pl(Wx, alpha):
        o = pallas_cells.lif_pallas(
            Wx, alpha, 1.0, u0, s0, drop_rate=p, drop_seed=seed
        )
        return (o * wgt).sum()

    def loss_oracle(Wx, alpha):
        o = cells.lif_scan(Wx, alpha, 1.0, u0, s0) * mask / (1.0 - p)
        return (o * wgt).sum()

    gp = jax.grad(loss_pl, argnums=(0, 1))(Wx, alpha)
    gs = jax.grad(loss_oracle, argnums=(0, 1))(Wx, alpha)
    for name, x, y in zip(("Wx", "alpha"), gp, gs):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=1e-4, rtol=1e-5,
            err_msg=f"fused-dropout grad {name}",
        )




def test_wide_layer_short_unroll():
    """H >= 1536 switches to the 4-step unroll (_pick_tc cap) that keeps
    Mosaic compile time in seconds on real hardware; values and gradients
    must stay exact vs the scan through the different chunking."""
    from sparch_tpu.ops.pallas_cells import _pick_tc

    Hq, Bq, Tq = 1536, 4, 10
    assert _pick_tc(Tq, Hq) == 4  # wide cap engaged (tail chunk live)
    assert _pick_tc(100, 512) == 10  # narrow layers unchanged
    ks = jax.random.split(jax.random.PRNGKey(41), 3)
    Wx = jax.random.normal(ks[0], (Bq, Tq, Hq)) * 2.0
    alpha = jax.random.uniform(ks[1], (Hq,), minval=0.82, maxval=0.95)
    V = jnp.round(jax.random.uniform(
        ks[2], (Hq, Hq), minval=-0.5, maxval=0.5) * 64) / 64
    z = jnp.zeros((Bq, Hq))
    got = pallas_cells.rlif_pallas(Wx, alpha, V, 1.0, z, z)
    want = cells.rlif_scan(Wx, alpha, V, 1.0, z, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def loss(fn):
        return lambda Wx, V: (
            fn(Wx, alpha, V, 1.0, z, z)
            * jnp.arange(Hq, dtype=jnp.float32)
        ).sum()

    gp = jax.grad(loss(pallas_cells.rlif_pallas), argnums=(0, 1))(Wx, V)
    gs = jax.grad(loss(cells.rlif_scan), argnums=(0, 1))(Wx, V)
    for a, b in zip(gp, gs):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, rtol=1e-3
        )


def test_pallas_h_caps_per_cell():
    """The 'auto' fused-path width caps follow each cell's resident-VMEM
    footprint: 2048 for single-V cells, lower for multi-gate ANN cells."""
    from sparch_tpu.models.ann import GRULayer, LiGRULayer, RNNLayer
    from sparch_tpu.models.snn import RadLIFLayer

    assert RadLIFLayer._pallas_h_cap == 2048
    assert RNNLayer._pallas_h_cap == 2048
    assert LiGRULayer._pallas_h_cap == 1536
    assert GRULayer._pallas_h_cap == 1024


def _reconstruct_keep(Bq, Tq, Hq, seed, drop_rate):
    """Rebuild the fused-dropout keep mask OUTSIDE the kernel from the
    same hash the interpret path uses (per batch-tile, per step), giving
    a position-exact oracle — spike outputs can be 0 for kept positions,
    so the mask cannot be recovered from outputs alone."""
    from sparch_tpu.ops.pallas_cells import (
        _keep_u32, _pick_tc, _random_keep, _round_up, _tile_plan,
    )

    Bp = _round_up(Bq, 8)
    Hp = _round_up(Hq, 128)
    tc = _pick_tc(Tq)
    bt = _tile_plan(Bp, Hp, streams=4, tc=tc)
    ku = _keep_u32(drop_rate)
    mask = np.zeros((Bp, Tq, Hp), bool)
    for tile in range(Bp // bt):
        for t in range(Tq):
            blk = _random_keep(
                (bt, Hp), seed[0], seed[1], tile, t, ku, use_hw_prng=False
            )
            mask[tile * bt : (tile + 1) * bt, t] = np.asarray(blk)
    return mask[:Bq, :, :Hq]


def test_prime_T_tail_chunk():
    """T=19 -> tc=8 with a 3-step tail: the out-of-bounds sanitisation
    in both kernels (dead when tc | T) must keep values and every
    gradient exact vs the scan."""
    ks = jax.random.split(jax.random.PRNGKey(21), 7)
    Bp_, Tp_, Hp_ = 8, 19, 24
    Wx = jax.random.normal(ks[0], (Bp_, Tp_, Hp_)) * 2.0
    alpha = jax.random.uniform(ks[1], (Hp_,), minval=0.82, maxval=0.95)
    beta = jax.random.uniform(ks[2], (Hp_,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[3], (Hp_,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[4], (Hp_,), minval=0, maxval=2)
    V = jax.random.orthogonal(ks[5], Hp_)
    z = jnp.zeros((Bp_, Hp_))
    sc = 1.0 + 0.1 * jax.random.normal(ks[6], (Hp_,))
    sh = jnp.zeros((Hp_,))

    from sparch_tpu.ops.pallas_cells import _pick_tc

    assert Tp_ % _pick_tc(Tp_) != 0  # really exercises the tail

    def scan_fn(Wx, V):
        return cells.radlif_scan(
            sc * Wx + sh, alpha, beta, a, b, V, 1.0, z, z, z
        )

    def pallas_fn(Wx, V):
        return pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z, scale=sc, shift=sh
        )

    np.testing.assert_allclose(
        np.asarray(pallas_fn(Wx, V)), np.asarray(scan_fn(Wx, V)), atol=1e-5
    )

    def loss(fn):
        return lambda Wx, V: (
            fn(Wx, V) * jnp.arange(Hp_, dtype=jnp.float32)
        ).sum()

    gs = jax.grad(loss(scan_fn), argnums=(0, 1))(Wx, V)
    gp = jax.grad(loss(pallas_fn), argnums=(0, 1))(Wx, V)
    for s_, p_ in zip(gs, gp):
        np.testing.assert_allclose(
            np.asarray(p_), np.asarray(s_), atol=2e-4, rtol=1e-4
        )

    # fused dropout across the tail: values AND gradients must equal the
    # explicit-mask oracle built from the kernel's own hash (the backward
    # regenerates masks per (tile, step) — wrong tail indexing would
    # corrupt the adjoints)
    seed = jnp.array([5, 9], jnp.int32)
    p_ = 0.3
    mask = jnp.asarray(_reconstruct_keep(Bp_, Tp_, Hp_, [5, 9], p_))
    raw = pallas_cells.radlif_pallas(
        Wx, alpha, beta, a, b, V, 1.0, z, z, z
    )
    d1 = pallas_cells.radlif_pallas(
        Wx, alpha, beta, a, b, V, 1.0, z, z, z,
        drop_rate=p_, drop_seed=seed,
    )
    np.testing.assert_allclose(
        np.asarray(d1),
        np.asarray(jnp.where(mask, raw / (1.0 - p_), 0.0)),
        atol=1e-6,
    )

    def loss_fused(Wx, V):
        d = pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z,
            drop_rate=p_, drop_seed=seed,
        )
        return (d * jnp.arange(Hp_, dtype=jnp.float32)).sum()

    def loss_oracle(Wx, V):
        r = pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z
        )
        return (
            jnp.where(mask, r / (1.0 - p_), 0.0)
            * jnp.arange(Hp_, dtype=jnp.float32)
        ).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1))(Wx, V)
    go = jax.grad(loss_oracle, argnums=(0, 1))(Wx, V)
    for f_, o_ in zip(gf, go):
        np.testing.assert_allclose(
            np.asarray(f_), np.asarray(o_), atol=2e-4, rtol=1e-4
        )


def test_multiple_batch_tiles():
    """B=136 -> Bp=136, bt=8 (17 batch tiles): exercises the cross-tile
    accumulator paths (dV/dalpha init at tile 0 only, += across tiles)
    and per-tile dropout keying that single-tile shapes never hit."""
    from sparch_tpu.ops.pallas_cells import _round_up, _tile_plan, _pick_tc

    ks = jax.random.split(jax.random.PRNGKey(31), 6)
    Bq, Tq, Hq = 136, 12, 24
    Bp_ = _round_up(Bq, 8)
    tc = _pick_tc(Tq)
    assert Bp_ // _tile_plan(Bp_, _round_up(Hq, 128), 4, tc) > 1

    Wx = jax.random.normal(ks[0], (Bq, Tq, Hq)) * 2.0
    alpha = jax.random.uniform(ks[1], (Hq,), minval=0.82, maxval=0.95)
    beta = jax.random.uniform(ks[2], (Hq,), minval=0.97, maxval=0.99)
    a = jax.random.uniform(ks[3], (Hq,), minval=-1, maxval=1)
    b = jax.random.uniform(ks[4], (Hq,), minval=0, maxval=2)
    V = jax.random.orthogonal(ks[5], Hq)
    z = jnp.zeros((Bq, Hq))

    def scan_fn(Wx, V):
        return cells.radlif_scan(Wx, alpha, beta, a, b, V, 1.0, z, z, z)

    def pallas_fn(Wx, V):
        return pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z
        )

    np.testing.assert_allclose(
        np.asarray(pallas_fn(Wx, V)), np.asarray(scan_fn(Wx, V)), atol=1e-5
    )

    def loss(fn):
        return lambda Wx, V: (
            fn(Wx, V) * jnp.arange(Hq, dtype=jnp.float32)
        ).sum()

    gs = jax.grad(loss(scan_fn), argnums=(0, 1))(Wx, V)
    gp = jax.grad(loss(pallas_fn), argnums=(0, 1))(Wx, V)
    for s_, p_ in zip(gs, gp):
        np.testing.assert_allclose(
            np.asarray(p_), np.asarray(s_), atol=2e-4, rtol=1e-4
        )

    # fused dropout keys on the batch-tile index: the dropped output must
    # equal the explicit-mask oracle across ALL tiles (fwd + grads), and
    # different tiles must draw different masks
    seed = jnp.array([3, 11], jnp.int32)
    p_ = 0.4
    mask = _reconstruct_keep(Bq, Tq, Hq, [3, 11], p_)
    assert not np.array_equal(mask[:8], mask[8:16])  # tile keying
    mask_j = jnp.asarray(mask)
    raw = pallas_fn(Wx, V)
    d1 = pallas_cells.radlif_pallas(
        Wx, alpha, beta, a, b, V, 1.0, z, z, z,
        drop_rate=p_, drop_seed=seed,
    )
    np.testing.assert_allclose(
        np.asarray(d1),
        np.asarray(jnp.where(mask_j, raw / (1.0 - p_), 0.0)),
        atol=1e-6,
    )

    def loss_fused(Wx, V):
        d = pallas_cells.radlif_pallas(
            Wx, alpha, beta, a, b, V, 1.0, z, z, z,
            drop_rate=p_, drop_seed=seed,
        )
        return (d * jnp.arange(Hq, dtype=jnp.float32)).sum()

    def loss_oracle(Wx, V):
        return (
            jnp.where(mask_j, pallas_fn(Wx, V) / (1.0 - p_), 0.0)
            * jnp.arange(Hq, dtype=jnp.float32)
        ).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1))(Wx, V)
    go = jax.grad(loss_oracle, argnums=(0, 1))(Wx, V)
    for f_, o_ in zip(gf, go):
        np.testing.assert_allclose(
            np.asarray(f_), np.asarray(o_), atol=2e-4, rtol=1e-4
        )
