"""Jitted train/eval steps.

One fused XLA program per step: forward (hoisted matmuls + scan cells),
CE loss + optional firing-rate hinge regularizer (reference exp.py:362-372),
backward through the unrolled scan with the boxcar surrogate, Adam update —
no host sync inside the epoch loop. Metrics are returned as device scalars;
the epoch driver aggregates them and fetches once per epoch (the reference
syncs every batch via ``.item()``/``.cpu()``, exp.py:363,381 — a major
throughput loss this design avoids).

Logged loss is the *pre-regularizer* CE, matching the reference's quirk of
recording ``loss_val.item()`` before adding the regularizer (exp.py:362-372).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_train_step", "make_eval_step"]


def _apply(model, params, batch_stats, x, train, rngs, mutable):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if mutable:
        (out, rates), mut = model.apply(
            variables, x, train=train, rngs=rngs, mutable=["batch_stats"]
        )
        return out, rates, mut.get("batch_stats", {})
    out, rates = model.apply(variables, x, train=train, rngs=rngs)
    return out, rates, batch_stats


def make_train_step(
    model,
    use_regularizers: bool = False,
    reg_factor: float = 0.5,
    reg_fmin: float = 0.01,
    reg_fmax: float = 0.5,
    donate: bool = True,
):
    """Build the jitted training step for ``model``.

    Returns ``train_step(state, x, y) -> (new_state, metrics)`` where
    ``metrics`` = {loss, acc, spike_rate} as device scalars.
    """
    is_snn = model.is_snn
    uses_state_rng = getattr(model, "state_init", None) == "uniform"

    def train_step(state, x, y):
        rng, state_rng, dropout_rng = jax.random.split(state.rng, 3)
        rngs = {"dropout": dropout_rng}
        if uses_state_rng:
            rngs["state"] = state_rng
        has_stats = bool(state.batch_stats)

        def loss_fn(params):
            out, rates, new_stats = _apply(
                model, params, state.batch_stats, x, True, rngs, has_stats
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
            loss = ce
            if is_snn and use_regularizers:
                # Hinge penalty on per-neuron firing rates (exp.py:369-372)
                reg_quiet = jax.nn.relu(reg_fmin - rates).sum()
                reg_burst = jax.nn.relu(rates - reg_fmax).sum()
                loss = loss + reg_factor * (reg_quiet + reg_burst)
            return loss, (ce, out, rates, new_stats)

        grads, (ce, out, rates, new_stats) = jax.grad(loss_fn, has_aux=True)(
            state.params
        )
        new_state = state.apply_gradients(grads, new_stats).replace(rng=rng)
        pred = jnp.argmax(out, axis=-1)
        metrics = {
            "loss": ce,
            "acc": jnp.mean((pred == y).astype(jnp.float32)),
            "spike_rate": rates.mean() if is_snn else jnp.zeros(()),
        }
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model):
    """Build the jitted eval step: ``eval_step(state, x, y, rng) -> metrics``.

    ``rng`` drives the stochastic hidden-state init in 'uniform' mode (the
    reference randomises state even in eval, snns.py:286-287); it is unused
    in 'zeros' mode.
    """
    is_snn = model.is_snn
    uses_state_rng = getattr(model, "state_init", None) == "uniform"

    def eval_step(state, x, y, rng):
        rngs = {"state": rng} if uses_state_rng else {}
        out, rates, _ = _apply(
            model, state.params, state.batch_stats, x, False, rngs, False
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(out, y).mean()
        pred = jnp.argmax(out, axis=-1)
        return {
            "loss": ce,
            "acc": jnp.mean((pred == y).astype(jnp.float32)),
            "spike_rate": rates.mean() if is_snn else jnp.zeros(()),
        }

    return jax.jit(eval_step)
