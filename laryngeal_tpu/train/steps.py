"""Jitted train / eval step factories.

One XLA graph per step covering *preprocess -> forward -> loss -> backward ->
optimizer*, replacing the reference's host-side per-batch HF-processor +
``.to(device)`` + autograd sequence (``vivit_transformer/.../trainers/
trainer.py:62-167``). Inputs arrive as uint8 (B,T,H,W,C) host batches; the
augmentation RNG folds in the step counter so each step draws fresh noise
while staying reproducible. HF regimes (vivit/timesformer) are deterministic
at train time too — the reference applies the image processor, not random
augmentation, in those pipelines.

Data parallelism: the factories take an optional Mesh. Batches get
data-axis sharding, the state is replicated; GSPMD inserts the gradient
all-reduce over ICI. The same code runs single-chip when mesh is None.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batch_sharding, replicate, replicated_sharding, shard_batch
from ..preprocess.transforms import batch_preprocess, decode_wire_batch
from .losses import make_loss_fn, probs_fn
from .state import TrainState


def _constrain(x, sharding):
    """Pin a micro-batch slice back to the data-axis sharding (the reshape to
    (grad_accum, micro, ...) leaves GSPMD free to choose otherwise)."""
    if sharding is None:
        return x
    return jax.lax.with_sharding_constraint(x, sharding)


def make_train_step(
    model,
    regime: str,
    loss: str,
    pos_weight: float = 1.0,
    mesh=None,
    crop: int = 224,
    tp: bool = False,
    return_grads: bool = False,
    grad_accum: int = 1,
    wire: str = "rgb",
    wire_hw=None,
    wire_quality: int = 75,
    wire_keep_ac: int = 31,
) -> Callable:
    """Returns train_step(state, pixel_u8, labels, mask, rng) -> (state, metrics).

    ``wire`` selects the host->device payload format of ``pixel_u8``
    (rgb | i420 | delta | dct | dctp — see
    preprocess.transforms.decode_wire_batch); the in-graph decode fuses into
    this step. 'dct' ships a (dc, ac) tuple ('dctp' (dc, ac_hi, ac_pk)) and
    needs the static geometry ``wire_hw=(h, w)``.

    tp=True leaves the state's shardings unconstrained so tensor-parallel
    (model-axis) param shardings applied via parallel.tp.shard_train_state
    propagate through the step instead of being forced to replicate.
    return_grads=True adds the raw gradient pytree to metrics["grads"]
    (debug/equivalence-testing only — it defeats buffer donation savings).

    grad_accum>1 splits each batch into that many micro-batches and
    accumulates gradients over a lax.scan inside the SAME jitted graph: one
    optimizer update per batch, activation memory scaled by 1/grad_accum.
    Micro-batch losses/gradients are valid-count weighted, so for BN-free
    models the update is numerically the full-batch update (a micro-batch
    that is all padding contributes zero). BN models update their running
    stats sequentially per micro-batch — the same semantics torch gradient
    accumulation has. Requires batch_size % grad_accum == 0."""
    loss_fn = make_loss_fn(loss, pos_weight)
    get_probs = probs_fn(loss)
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")
    data_shard = batch_sharding(mesh) if mesh is not None else None
    # LARYNGEAL_NO_AUGMENT=1: train with the deterministic eval transforms
    # (pytorchvideo regime only — the HF regimes are deterministic anyway).
    # Debug/A-B hook: cross-framework comparisons (scripts/reference_ab.py)
    # cannot align torch and jax augmentation RNG streams, so both sides
    # pin the deterministic pipeline instead; read once at factory time.
    import os

    augment = regime == "pytorchvideo" and os.environ.get(
        "LARYNGEAL_NO_AUGMENT") != "1"

    def _forward_loss(params, stats, has_bn, clips, labels_m, mask_m, drng):
        variables = {"params": params}
        if has_bn:
            variables["batch_stats"] = stats
            logits, updates = model.apply(
                variables, clips, train=True, mutable=["batch_stats"],
                rngs={"dropout": drng},
            )
            new_stats = updates["batch_stats"]
        else:
            logits = model.apply(
                variables, clips, train=True, rngs={"dropout": drng}
            )
            new_stats = stats
        return loss_fn(logits, labels_m, mask_m), (logits, new_stats)

    def step(state: TrainState, pixel_u8, labels, mask, rng):
        rng = jax.random.fold_in(rng, state.step)
        aug_rng, dropout_rng = jax.random.split(rng)
        has_bn = bool(state.batch_stats)

        if grad_accum == 1:
            clips = batch_preprocess(
                decode_wire_batch(pixel_u8, wire, wire_hw, wire_quality,
                                  wire_keep_ac),
                regime, train=augment, key=aug_rng,
                crop=crop,
            )
            (loss_val, (logits, new_stats)), grads = jax.value_and_grad(
                _forward_loss, has_aux=True
            )(state.params, state.batch_stats, has_bn, clips, labels, mask,
              dropout_rng)
        else:
            batch = jax.tree_util.tree_leaves(pixel_u8)[0].shape[0]
            if batch % grad_accum:
                raise ValueError(
                    f"batch size {batch} not divisible by grad_accum {grad_accum}"
                )
            micro = batch // grad_accum
            # STRIDED micro-batch split: micro-batch g takes elements
            # {g, g+ga, g+2ga, ...}. Under a data-parallel mesh each device's
            # contiguous batch shard contributes exactly micro/n_data
            # elements to every micro-batch, so the sharding-constraint
            # re-pin below is a device-local relayout — a consecutive
            # (ga, micro) reshape would give each micro-batch to a device
            # *subset* and force an all-to-all per micro-step (round-2
            # ADVICE). Numerically identical for the accumulated update
            # (valid-count-weighted sum is permutation-invariant).
            def _strided(x):
                perm = (1, 0) + tuple(range(2, x.ndim + 1))
                return x.reshape(micro, grad_accum, *x.shape[1:]).transpose(perm)

            # The wire payload stays encoded through the split (decode runs
            # per micro-batch inside the scan, so decoded-RGB peak memory
            # scales with the micro-batch, not the full batch).
            px = jax.tree_util.tree_map(_strided, pixel_u8)
            lb = _strided(labels)
            mk = _strided(mask)
            zero_grads = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), state.params
            )

            def body(carry, xs):
                stats, gsum, lsum, csum = carry
                px_i, lb_i, mk_i, i = xs
                px_i = _constrain(px_i, data_shard)
                clips = batch_preprocess(
                    decode_wire_batch(px_i, wire, wire_hw, wire_quality,
                                      wire_keep_ac),
                    regime, train=augment,
                    key=jax.random.fold_in(aug_rng, i), crop=crop,
                )
                (loss_i, (logits_i, stats)), grads_i = jax.value_and_grad(
                    _forward_loss, has_aux=True
                )(state.params, stats, has_bn, clips, lb_i, mk_i,
                  jax.random.fold_in(dropout_rng, i))
                cnt = jnp.sum(mk_i.astype(jnp.float32))
                gsum = jax.tree_util.tree_map(
                    lambda a, g: a + g.astype(jnp.float32) * cnt, gsum, grads_i
                )
                return (stats, gsum, lsum + loss_i * cnt, csum + cnt), logits_i

            (new_stats, gsum, lsum, csum), logits = jax.lax.scan(
                body,
                (state.batch_stats, zero_grads, jnp.float32(0), jnp.float32(0)),
                (px, lb, mk, jnp.arange(grad_accum)),
            )
            denom = jnp.maximum(csum, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / denom, gsum)
            loss_val = lsum / denom
            # Invert the strided split: scan position (g, m) holds global
            # element m*ga + g, so (ga, micro, ...) -> (micro, ga, ...) ->
            # flatten restores batch order for the metrics below.
            perm = (1, 0) + tuple(range(2, logits.ndim))
            logits = logits.transpose(perm).reshape(batch, *logits.shape[2:])

        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)

        probs = get_probs(logits)
        preds = jnp.argmax(probs, axis=-1)
        valid = mask.astype(jnp.float32)
        correct = jnp.sum((preds == labels.astype(preds.dtype)) * valid)
        metrics = {
            "loss": loss_val,
            "correct": correct,
            "count": jnp.sum(valid),
            "probs": probs,
        }
        if return_grads:
            metrics["grads"] = grads
        return new_state, metrics

    donate = (0,) if not return_grads else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    # Multi-process: per-batch probs must come back to every host for the
    # epoch metrics, and a data-sharded output is not fully addressable —
    # replicate it (an all-gather of (B, n_classes), negligible).
    probs_sh = rep if jax.process_count() > 1 else data
    if tp:
        return jax.jit(step, donate_argnums=donate,
                       in_shardings=(None, data, data, data, rep))
    out_metrics = {"loss": rep, "correct": rep, "count": rep, "probs": probs_sh}
    if return_grads:
        out_metrics["grads"] = rep
    return jax.jit(
        step,
        donate_argnums=donate,
        in_shardings=(rep, data, data, data, rep),
        out_shardings=(rep, out_metrics),
    )


def make_eval_step(model, regime: str, loss: str, pos_weight: float = 1.0,
                   mesh=None, crop: int = 224, tp: bool = False,
                   wire: str = "rgb", wire_hw=None,
                   wire_quality: int = 75, wire_keep_ac: int = 31) -> Callable:
    """Returns eval_step(state, pixel_u8, labels, mask) -> metrics (incl. probs)."""
    loss_fn = make_loss_fn(loss, pos_weight)
    get_probs = probs_fn(loss)

    def step(state: TrainState, pixel_u8, labels, mask):
        clips = batch_preprocess(
            decode_wire_batch(pixel_u8, wire, wire_hw, wire_quality,
                                  wire_keep_ac),
            regime, train=False, crop=crop)
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        logits = model.apply(variables, clips, train=False)
        loss_val = loss_fn(logits, labels, mask)
        probs = get_probs(logits)
        preds = jnp.argmax(probs, axis=-1)
        valid = mask.astype(jnp.float32)
        return {
            "loss": loss_val,
            "correct": jnp.sum((preds == labels.astype(preds.dtype)) * valid),
            "count": jnp.sum(valid),
            "probs": probs,
        }

    if mesh is None:
        return jax.jit(step)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    probs_sh = rep if jax.process_count() > 1 else data
    if tp:
        return jax.jit(step, in_shardings=(None, data, data, data))
    return jax.jit(
        step,
        in_shardings=(rep, data, data, data),
        out_shardings={"loss": rep, "correct": rep, "count": rep, "probs": probs_sh},
    )


def prepare_batch(batch: Dict, mesh=None) -> Tuple:
    """Host batch dict -> (pixel_u8, labels, mask) device arrays.

    pixel_values may be a wire-format pytree (dct ships a (dc, ac) tuple);
    every leaf is batch-leading, so one batch sharding covers the tree."""
    if mesh is not None:
        b = shard_batch(mesh, {k: batch[k] for k in ("pixel_values", "labels", "mask")})
        return b["pixel_values"], b["labels"], b["mask"]
    return (
        jax.tree_util.tree_map(jnp.asarray, batch["pixel_values"]),
        jnp.asarray(batch["labels"]),
        jnp.asarray(batch["mask"]),
    )
