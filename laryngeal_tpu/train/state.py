"""Train state + optimizer factory.

Optimizers per the reference variants (SURVEY.md §2.3): Adam (2d-lstm on
trainable params only, resnet3d) and AdamW (vivit/timesformer wd 0.01, swin
wd 0.05). Learning rate is an injected hyperparameter so the host-side
ReduceLROnPlateau (train/selection.py) can rewrite it between epochs without
retracing — the TPU-native equivalent of torch's scheduler mutating
param_groups.
"""

from __future__ import annotations

from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any  # {} for models without BatchNorm
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_batch_stats if new_batch_stats is not None else self.batch_stats,
        )


def _freeze_by_mask(tx: optax.GradientTransformation, mask) -> optax.GradientTransformation:
    """Zero both incoming gradients and outgoing updates for mask=False
    leaves. NOTE: optax.masked is NOT a freezer — it passes the raw gradient
    through unchanged as the update for unmasked leaves, which would train
    the 'frozen' params at learning-rate 1."""
    import jax

    def init(params):
        return tx.init(params)

    def update(grads, state, params=None):
        grads = jax.tree.map(
            lambda g, m: g if m else jnp.zeros_like(g), grads, mask)
        updates, state = tx.update(grads, state, params)
        updates = jax.tree.map(
            lambda u, m: u if m else jnp.zeros_like(u), updates, mask)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    name: str,
    learning_rate: float,
    weight_decay: float = 0.0,
    trainable_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """'adam' | 'adamw' with injectable learning_rate; optionally frozen so
    mask=False params (reference: the ResNet50 trunk) receive zero updates."""
    if name == "adam":
        tx = optax.inject_hyperparams(optax.adam)(learning_rate=learning_rate)
    elif name == "adamw":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=learning_rate, weight_decay=weight_decay
        )
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    if trainable_mask is not None:
        tx = _freeze_by_mask(tx, trainable_mask)
    return tx


def _unwrap_to_hyperparams(opt_state):
    """Walk through wrapper states (e.g. optax.masked's MaskedState) to the
    InjectHyperparams state, returning (wrappers outermost-first, inject_state)."""
    path = []
    inner = opt_state
    while not hasattr(inner, "hyperparams"):
        if not hasattr(inner, "inner_state"):
            raise ValueError("opt_state has no injected hyperparams")
        path.append(inner)
        inner = inner.inner_state
    return path, inner


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Rewrite the injected learning rate inside opt_state (host-side)."""
    path, inject = _unwrap_to_hyperparams(state.opt_state)
    hp = dict(inject.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    new_inner = inject._replace(hyperparams=hp)
    for wrapper in reversed(path):
        new_inner = wrapper._replace(inner_state=new_inner)
    return state.replace(opt_state=new_inner)


def get_learning_rate(state: TrainState) -> float:
    _, inject = _unwrap_to_hyperparams(state.opt_state)
    return float(inject.hyperparams["learning_rate"])


def create_train_state(
    model,
    rng: jax.Array,
    sample_input: jax.Array,
    optimizer: str = "adam",
    learning_rate: float = 1e-3,
    weight_decay: float = 0.0,
    trainable_mask_fn=None,
) -> TrainState:
    """Initialize params (+batch_stats) and the optimizer."""
    variables = model.init(rng, sample_input)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    mask = trainable_mask_fn(params) if trainable_mask_fn else None
    tx = make_optimizer(optimizer, learning_rate, weight_decay, mask)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=batch_stats,
        tx=tx,
    )
