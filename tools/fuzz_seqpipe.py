#!/usr/bin/env python
"""Random-config fuzz over the sequence-pipeline step vs its oracles.

`tests/test_seqpipe.py` pins ~45 fixed configurations; this tool
samples the CONFIG space — model type x normalization x bidirectional x
dropout x state init x AMP (bf16 compute_dtype, checked at bf16-noise
gradient tolerances) x mesh factorization (data x seq x model) x
microbatch count x (B, T, H, C, depth) — because the seqpipe step is a
composition
of seams (boundary-state ppermute handoff, microbatch pipelining, psum'd
BN stats, noise sharding, TP gather/slice) and a bug is most likely in
an INTERACTION nobody enumerated (e.g. bidirectional + TP + odd
microbatch count + 3 hidden layers).

Two check classes per drawn config, mirroring the suite's strategy:

- deterministic configs (dropout=0, zeros init): the pipelined step must
  reproduce the single-device train step — loss, accuracy, spike rate,
  post-update params (i.e. gradients), and batch-stat updates.
- noisy configs (dropout>0 or 'uniform' init): mesh invariance — the
  same state.rng on a second, differently-factorised mesh must give the
  same loss and updates (draw_noise runs at global shape outside
  shard_map, so the noise is bit-identical across meshes; the residual
  is chunked/psum'd f32 reduction order).

Tolerances are SELF-CALIBRATED for deterministic cases: chaotic
configs (unbounded relu/tanh recurrence + train-mode batchnorm at a
near-cancelling init) amplify per-schedule reassociation noise to
~1e-4 absolute — measured on seed-1 case 0 (LiGRU/batchnorm), where six
pipelined factorizations scatter pairwise 7e-6..2.5e-4 around the
single-device oracle with NO common offset while layernorm/none twins
of the same case sit at 1e-8. Each case therefore measures its own
noise ball via a second pipelined factorization (`_alt_factorization`);
a true seam bug offsets both pipelined runs TOGETHER, so their mutual
scatter stays at float noise and the tolerance stays tight. The noisy
branch compares two pipelined factorizations directly and could in
principle hit the same chaos (no case has yet); if one does, apply the
same dissection before touching product code: sweep factorizations,
check for a common offset, and swap the norm to layernorm/none as the
conditioning control.

Deterministic per --seed (case k re-runs bit-identically). Runs on the
virtual 8-device CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python tools/fuzz_seqpipe.py --cases 40 --seed 0 [--json out]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

MODEL_TYPES = ("LIF", "adLIF", "RLIF", "RadLIF", "MLP", "RNN", "LiGRU", "GRU")
NORMS = ("batchnorm", "layernorm", "none")
# (data, seq, model) factorizations available on 8 virtual devices
MESHES = ((1, 2, 1), (1, 4, 1), (1, 8, 1), (2, 2, 1), (2, 4, 1),
          (2, 2, 2), (1, 2, 2), (1, 4, 2))


def draw_config(rng):
    mt = MODEL_TYPES[int(rng.integers(len(MODEL_TYPES)))]
    data, seq, tp = MESHES[int(rng.integers(len(MESHES)))]
    bidir = bool(rng.random() < 0.3) and mt != "MLP"
    cfg = dict(
        model_type=mt,
        normalization=NORMS[int(rng.integers(len(NORMS)))],
        bidirectional=bidir,
        dropout=0.0 if rng.random() < 0.45 else float(rng.uniform(0.05, 0.5)),
        state_init="zeros" if rng.random() < 0.5 else "uniform",
        data=data, seq=seq, tp=tp,
    )
    # ANN models ignore state_init (build_model drops it); normalise the
    # drawn value so the deterministic/noisy split below is correct
    if mt in ("MLP", "RNN", "LiGRU", "GRU"):
        cfg["state_init"] = "zeros"
    cfg["n_micro"] = int(rng.choice((1, 2, 4)))
    # AMP (bf16 compute_dtype): checked at bf16-noise tolerances — the
    # two step functions are separately compiled modules whose bf16
    # roundings XLA may place differently (see
    # test_seqpipe_amp_matches_single_device)
    cfg["amp"] = bool(rng.random() < 0.3)
    cfg["use_bias"] = bool(rng.random() < 0.3)
    local_mult = int(rng.integers(1, 4))
    cfg["B"] = data * cfg["n_micro"] * local_mult
    cfg["T"] = seq * int(rng.integers(2, 7))
    # hidden width: divisible by the model axis; keep CPU cost tiny
    cfg["H"] = tp * 2 * int(rng.integers(3, 13))
    cfg["C"] = int(rng.choice((3, 5, 7)))
    cfg["F"] = int(rng.integers(6, 20))
    cfg["depth"] = int(rng.choice((1, 2, 3)))
    cfg["regs"] = bool(rng.random() < 0.5)
    return cfg


def _name(cfg):
    return (f"{cfg['model_type']}/{cfg['normalization'][:5]}"
            f"{'/bidir' if cfg['bidirectional'] else ''}"
            f"{'/amp' if cfg.get('amp') else ''}"
            f"{'/bias' if cfg.get('use_bias') else ''}"
            f"/p{cfg['dropout']:.2f}/{cfg['state_init'][:4]}"
            f"@d{cfg['data']}s{cfg['seq']}m{cfg['tp']}"
            f"u{cfg['n_micro']}"
            f"/B{cfg['B']}T{cfg['T']}H{cfg['H']}C{cfg['C']}L{cfg['depth']}")


def _alt_factorization(cfg):
    """A second valid (data, seq, n_micro) for the same case, used to
    MEASURE the case's reassociation-noise ball (see run_case). None if
    the drawn shape admits no alternative."""
    data, seq, tp, u = cfg["data"], cfg["seq"], cfg["tp"], cfg["n_micro"]
    if seq >= 4:  # T = seq * k, so seq//2 divides T
        return data, seq // 2, u
    if data * 4 * tp <= 8 and cfg["T"] % 4 == 0:
        return data, 4, u
    local_b = cfg["B"] // data
    if u > 1:
        return data, seq, 1
    if local_b % 2 == 0:
        return data, seq, 2
    return None


def run_case(cfg, rng):
    import jax

    from sparch_tpu.models import build_model
    from sparch_tpu.parallel.seqpipe import (
        make_seq_mesh, make_seqpipe_train_step, seq_batch_sharding,
    )
    from sparch_tpu.train.state import create_train_state
    from sparch_tpu.train.steps import make_train_step

    import jax.numpy as jnp

    B, T, F, H, C = cfg["B"], cfg["T"], cfg["F"], cfg["H"], cfg["C"]
    amp = cfg.get("amp", False)
    layers = [H] * cfg["depth"] + [C]
    model = build_model(
        cfg["model_type"], (B, T, F), layers,
        dropout=cfg["dropout"], normalization=cfg["normalization"],
        bidirectional=cfg["bidirectional"], state_init=cfg["state_init"],
        cell_impl="scan", use_bias=cfg.get("use_bias", False),
        compute_dtype=jnp.bfloat16 if amp else None,
    )
    x = (rng.random((B, T, F)) < 0.3).astype(np.float32)
    y = (np.arange(B) % C).astype(np.int64)
    key = jax.random.PRNGKey(int(rng.integers(2**31)))

    def fresh_state():  # pipe steps donate their state argument
        return create_train_state(model, x, lr=1e-2, rng=key)

    mesh = make_seq_mesh(
        jax.devices()[: cfg["data"] * cfg["seq"] * cfg["tp"]],
        data=cfg["data"], model=cfg["tp"],
    )
    pipe = make_seqpipe_train_step(
        model, mesh, n_micro=cfg["n_micro"], use_regularizers=cfg["regs"]
    )
    xs = jax.device_put(x, seq_batch_sharding(mesh))
    new_state, metrics = pipe(fresh_state(), xs, y)

    deterministic = cfg["dropout"] == 0.0 and cfg["state_init"] == "zeros"
    fails = []
    noise_scale = 0.0  # measured below for deterministic cases
    m = {"loss": float(metrics["loss"]), "acc": float(metrics["acc"])}
    if not np.isfinite(m["loss"]):
        fails.append(f"non-finite loss {m['loss']}")

    if deterministic:
        ref_step = make_train_step(
            model, donate=False, use_regularizers=cfg["regs"]
        )
        ref_state, ref_metrics = ref_step(fresh_state(), x, y)
        oracle = "single-device step"
        ref_loss = float(ref_metrics["loss"])
        # Self-calibrated chaos scale: unbounded-recurrence families
        # (LiGRU/GRU/RNN relu/tanh chains) with train-mode batchnorm can
        # amplify per-schedule reassociation noise to ~1e-4 ABSOLUTE on
        # near-cancelling (leafmax ~1e-3) gradients — measured on the
        # seed-1 LiGRU/batchnorm case: six pipelined factorizations
        # scatter pairwise by 7e-6..2.5e-4 with NO common offset vs the
        # single-device step (pure conditioning noise, not a seam bug).
        # So measure this case's own noise ball with a SECOND pipelined
        # factorization. A real seam bug adds a COMMON offset to both
        # pipelined runs: their mutual scatter stays at float noise, the
        # tolerance stays tight, and the bug is still caught.
        noise_scale = 0.0
        alt = _alt_factorization(cfg)
        if alt is not None:
            d2, s2, u2 = alt
            mesh2 = make_seq_mesh(
                jax.devices()[: d2 * s2 * cfg["tp"]], data=d2,
                model=cfg["tp"],
            )
            pipe2 = make_seqpipe_train_step(
                model, mesh2, n_micro=u2, use_regularizers=cfg["regs"]
            )
            xs2 = jax.device_put(x, seq_batch_sharding(mesh2))
            alt_state, _ = pipe2(fresh_state(), xs2, y)
            for (kp_a, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(new_state.opt_state),
                jax.tree_util.tree_leaves_with_path(alt_state.opt_state),
            ):
                if "mu" not in jax.tree_util.keystr(kp_a):
                    continue
                d = float(np.max(np.abs(
                    np.asarray(a, np.float64) - np.asarray(b, np.float64)
                )))
                noise_scale = max(noise_scale, d)
            m["noise_scale"] = noise_scale
        for k in ("acc", "spike_rate"):
            if k not in ref_metrics or k not in metrics:
                continue
            dv = abs(float(ref_metrics[k]) - float(metrics[k]))
            # amp: bf16 logit noise may flip one argmax; telemetry is
            # f32 over bf16 streams
            tol = (1.5 / cfg["B"] if k == "acc" else 1e-2) if cfg.get(
                "amp") else 1e-5
            if dv > tol:
                fails.append(f"{k} delta {dv:.2e}")
    else:
        # mesh invariance: re-run on a 2-way pure-seq mesh, n_micro=1
        mesh2 = make_seq_mesh(jax.devices()[:2])
        pipe2 = make_seqpipe_train_step(
            model, mesh2, n_micro=1, use_regularizers=cfg["regs"]
        )
        xs2 = jax.device_put(x, seq_batch_sharding(mesh2))
        ref_state, ref_metrics = pipe2(fresh_state(), xs2, y)
        oracle = "2-way seq mesh"
        ref_loss = float(ref_metrics["loss"])

    m["ref_loss"] = ref_loss
    m["oracle"] = oracle
    loss_tol = 4e-3 if amp else 1e-4
    if abs(m["loss"] - ref_loss) > loss_tol * max(1.0, abs(ref_loss)):
        fails.append(f"loss {m['loss']:.6f} vs {oracle} {ref_loss:.6f}")
    # Compare GRADIENTS (Adam mu at step 1 = 0.1*g), not post-Adam
    # params: Adam's m/sqrt(v) normalization amplifies any sub-noise
    # sign flip on a near-zero gradient element to a 2*lr param jump —
    # even pure-f32 reduction-order noise (monolithic vs psum'd) hits
    # this lottery once in ~1e2 random configs. mu deltas measure the
    # actual gradient agreement. AMP tolerance is bf16-noise (the two
    # step functions are separately compiled modules).
    worst = 0.0
    if amp:
        # loss delta beyond f32 noise = one bf16 rounding flipped between
        # the modules and the trajectories legitimately diverged; relax
        # to flip-tolerant (see test_seqpipe_amp_matches_single_device)
        flipped = abs(m["loss"] - ref_loss) > 1e-5 * max(1.0, abs(ref_loss))
        factor = 0.15 if flipped else 0.025
    else:
        # 2e-3 relative, not f32-eps: train-mode BN variance is
        # E[x^2]-E[x]^2 (flax's own formula), whose cancellation
        # amplifies f32 reduction-order noise by E[x^2]/var when the
        # drive is poorly centered — a random-config draw regularly
        # hits 1e-5-relative forward noise and ~1e-3-relative gradient
        # noise between the monolithic and per-shard+psum associations.
        # Real seam bugs sit 10-1000x above this; the curated
        # test_seqpipe configs keep the tight 2e-5 post-update contract.
        factor = 2e-3
    for (kp_r, a), (kp_n, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state.opt_state),
        jax.tree_util.tree_leaves_with_path(new_state.opt_state),
    ):
        key = jax.tree_util.keystr(kp_r)
        if "mu" not in key:
            continue
        a64 = np.asarray(a, np.float64)
        b64 = np.asarray(b, np.float64)
        leafmax = float(np.max(np.abs(a64)))
        # absolute floor: leaves whose true gradient is ~0 (a projection
        # bias under batchnorm — BN subtracts the mean, so dbias cancels
        # exactly) hold only cancellation noise on BOTH sides; comparing
        # noise to noise at a relative tolerance is meaningless. The
        # floor sits 10-100x under any real gradient bug (mu = 0.1*g).
        proj_bias = key.endswith("['bias']") and "BatchNorm" not in key
        if amp:
            floor = 1e-3
        elif proj_bias and cfg["normalization"] == "batchnorm":
            floor = 1e-4
        else:
            floor = 1e-5
        # 25x the measured factorization-to-factorization scatter: the
        # noise ball is sampled by ONE alt pair, which can understate
        # the full spread ~15x (measured); a seam bug keeps the scatter
        # at float noise so this term stays inert for it
        tol = max(factor * leafmax, floor, 25.0 * noise_scale)
        d = float(np.max(np.abs(b64 - a64)))
        if d > tol:
            fails.append(f"grads(mu) {key} delta {d:.2e} > {tol:.2e}")
        if d > worst:
            worst = d
    m["worst_grad_delta"] = worst
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_state.batch_stats),
        jax.tree_util.tree_leaves(new_state.batch_stats),
    ):
        a64 = np.asarray(a, np.float64)
        d = float(np.max(np.abs(np.asarray(b) - a64)))
        # amp: relative at bf16 noise; non-amp keeps the original
        # absolute 1e-4 contract
        tol = 5e-3 * max(1.0, float(np.max(np.abs(a64)))) if amp else 1e-4
        if d > tol:
            fails.append(f"batch_stats delta {d:.2e}")
            break
    return m, fails


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--only", default="", help="substring filter on name")
    ap.add_argument("--json", default="", help="write results to this file")
    args = ap.parse_args()

    # the virtual CPU mesh, exactly like tests/conftest.py
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= 8, "need 8 virtual CPU devices"

    results, n_fail, k, ran = [], 0, 0, 0
    while ran < args.cases:
        rng = np.random.default_rng((args.seed << 20) ^ k)
        cfg = draw_config(rng)
        name = _name(cfg)
        k += 1
        if args.only and args.only not in name:
            continue
        try:
            m, fails = run_case(cfg, rng)
        except Exception as e:  # noqa: BLE001 — report, keep fuzzing
            m, fails = {}, [f"EXCEPTION: {type(e).__name__}: {e}"]
        ran += 1
        status = "PASS" if not fails else "FAIL"
        n_fail += bool(fails)
        print(f"{status}  #{k - 1:<4d} {name:<52}"
              + (f"  [{'; '.join(fails)}]" if fails else ""), flush=True)
        results.append({"k": k - 1, "case": name, "status": status, **m,
                        "fails": fails})
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"seed": args.seed, "results": results}, f, indent=1)
    print(f"{ran} cases, {n_fail} failed", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
