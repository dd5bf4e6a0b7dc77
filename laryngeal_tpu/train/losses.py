"""Loss library — the two loss regimes the reference uses.

- Cross-entropy on 2-class logits (vivit/timesformer/resnet3d/swin trainers).
- BCE-with-logits with pos_weight (2d-lstm,
  ``resnet50-2d-lstm/src/trainer/trainer.py:35-42``), where
  ``pos_weight = (N/(2*n_pos)) / (N/(2*n_neg)) * 1.5 = 1.5 * n_neg / n_pos``.

All functions take an optional per-sample validity mask (for padded final
batches) and reduce with a masked mean.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _masked_mean(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.mean(x)
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean CE over integer labels; logits (B, C)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return _masked_mean(nll, mask)


def bce_with_logits(logits: jax.Array, labels: jax.Array,
                    pos_weight: float = 1.0,
                    mask: Optional[jax.Array] = None) -> jax.Array:
    """torch BCEWithLogitsLoss(pos_weight) semantics; logits (B,) or (B,1)."""
    x = logits.reshape(-1).astype(jnp.float32)
    y = labels.reshape(-1).astype(jnp.float32)
    loss = -(pos_weight * y * jax.nn.log_sigmoid(x) + (1.0 - y) * jax.nn.log_sigmoid(-x))
    return _masked_mean(loss, mask)


def reference_pos_weight(num_pos: int, num_neg: int, scale: float = 1.5) -> float:
    """The 2d-lstm trainer's class weighting (trainer.py:35-42)."""
    if num_pos <= 0:
        return scale
    return float(num_neg) / float(num_pos) * scale


def binary_probs_from_logit(logits: jax.Array) -> jax.Array:
    """(B,) or (B,1) single-logit head -> (B, 2) class probabilities."""
    p1 = jax.nn.sigmoid(logits.reshape(-1).astype(jnp.float32))
    return jnp.stack([1.0 - p1, p1], axis=-1)


def make_loss_fn(loss: str, pos_weight: float = 1.0):
    """'ce' | 'bce_pos_weight' -> callable(logits, labels, mask)."""
    if loss == "ce":
        return cross_entropy
    if loss == "bce_pos_weight":
        def fn(logits, labels, mask=None):
            return bce_with_logits(logits, labels, pos_weight=pos_weight, mask=mask)
        return fn
    raise ValueError(f"Unknown loss {loss!r}")


def probs_fn(loss: str):
    """Logits -> (B,2) probabilities, per head type (softmax vs sigmoid)."""
    if loss == "ce":
        return lambda logits: jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    if loss == "bce_pos_weight":
        return binary_probs_from_logit
    raise ValueError(f"Unknown loss {loss!r}")
