"""Functional training state: params + batch stats + optimizer state + RNG.

Replaces the reference's stateful ``Experiment``/torch-optimizer pairing
(exp.py:89-100) with an immutable pytree threaded through jitted steps.
The learning rate is injected as an optimizer hyperparameter so the
metric-driven plateau schedule (sparch_tpu.train.schedule) can update it
between epochs without re-jitting.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

__all__ = ["TrainState", "create_train_state", "adam_with_injectable_lr"]


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )

    @property
    def lr(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    def set_lr(self, lr: float) -> "TrainState":
        hyper = dict(self.opt_state.hyperparams)
        hyper["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hyper))


def adam_with_injectable_lr(lr: float) -> optax.GradientTransformation:
    """Adam with torch-default hyperparameters (betas 0.9/0.999, eps 1e-8)
    and a mutable learning rate (reference exp.py:89)."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8
    )


def create_train_state(
    model,
    sample_input: jax.Array,
    lr: float,
    rng: jax.Array,
    state_init: Optional[str] = None,
) -> TrainState:
    """Initialise model variables and optimizer state."""
    params_key, state_key, run_key = jax.random.split(rng, 3)
    init_rngs = {"params": params_key}
    uses_state_rng = state_init == "uniform" or (
        state_init is None and getattr(model, "state_init", None) == "uniform"
    )
    if uses_state_rng:
        init_rngs["state"] = state_key
    variables = model.init(init_rngs, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = adam_with_injectable_lr(lr)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        rng=run_key,
        tx=tx,
    )
