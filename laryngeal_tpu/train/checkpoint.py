"""Checkpointing — Orbax for the train state, JSON sidecars for metadata.

Reference checkpoint contract (``vivit_transformer/.../trainers/
trainer.py:278-305`` and ``utils/early_stopping.py:42-56``): a dict with
epoch, model state, optimizer state, loss/acc history, config, and
id2label/label2id. The TPU equivalent stores the full TrainState pytree
(params + opt_state + batch_stats + step) via Orbax and the JSON-able
metadata alongside, enabling both best-model reload (the only thing the
reference does) and true mid-training resume (which the reference saves the
data for but never implements — SURVEY.md §5).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .state import TrainState


def _state_pytree(state: TrainState) -> Dict:
    return {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "batch_stats": state.batch_stats,
    }


def save_checkpoint(
    path,
    state: TrainState,
    epoch: int = 0,
    history: Optional[Dict] = None,
    config: Optional[Dict] = None,
    class_labels=None,
) -> str:
    """Write an Orbax checkpoint + metadata.json at `path` (a directory).

    Multi-process: EVERY process must call this (orbax's save carries
    internal cross-process syncs — a rank-gated call deadlocks the others);
    the filesystem side (tmp cleanup, metadata, rename) runs on process 0
    only, with barriers around it.
    """
    import shutil

    primary = jax.process_index() == 0
    multiproc = jax.process_count() > 1
    if multiproc:
        from jax.experimental import multihost_utils

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    # Write-then-rename: the previous best checkpoint survives a failed or
    # interrupted save (disk full, preemption) instead of being rmtree'd
    # before the replacement exists.
    tmp = path.parent / (path.name + ".tmp")
    if primary and tmp.exists():
        shutil.rmtree(tmp)
    if multiproc:
        multihost_utils.sync_global_devices("laryngeal_ckpt_pre")

    # Gather to host numpy first: keeps checkpoints portable across meshes
    # (a tensor-parallel-sharded state restores on a single chip or a
    # different mesh shape); orbax fetches device buffers to host to write
    # them anyway, so this adds no extra transfer.
    def _to_host(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            if x.sharding.is_fully_replicated:
                # Multi-process replicated leaf: any local shard IS the value.
                return np.asarray(x.addressable_shards[0].data)
            raise NotImplementedError(
                "multi-process checkpointing of non-replicated (fsdp/tp-"
                "across-hosts) states needs coordinated orbax saving; "
                "replicate the state or save from a single-process run")
        return jax.device_get(x)

    host_state = jax.tree_util.tree_map(_to_host, _state_pytree(state))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp / "state", host_state)

    class_labels = list(class_labels or [])
    meta = {
        "epoch": int(epoch),
        "history": history or {},
        "config": config or {},
        "class_labels": class_labels,
        "id2label": {str(i): c for i, c in enumerate(class_labels)},
        "label2id": {c: i for i, c in enumerate(class_labels)},
    }
    if primary:
        with open(tmp / "metadata.json", "w") as f:
            json.dump(meta, f, indent=4, default=str)

        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
    if multiproc:
        multihost_utils.sync_global_devices("laryngeal_ckpt_post")
    return str(path)


def _restore_cross_layout(path: Path, state_template: TrainState,
                          cause: Exception) -> Dict:
    """Bridge the GPipe param layout (parallel/pp.py ``{"stacked","rest"}``)
    and the sequential ``layer_{i}`` layout when the checkpoint and the
    template disagree — e.g. running inference on a checkpoint written by a
    ``--pp_stages`` training run, or warm-starting a pipelined run from a
    sequential checkpoint. Params convert exactly (stack/unstack is a pure
    relayout); the optimizer state is taken fresh from the template (its
    moment trees mirror the other layout), so a cross-layout restore resets
    optimizer momentum — fine for inference/eval and for warm starts, warned
    at runtime rather than silently half-restored.

    Raises ``cause`` (the templated-restore failure) unchanged when the
    checkpoint is NOT a pipeline<->sequential relayout, so corrupt files and
    shape mismatches surface as themselves instead of a misleading layout
    error.
    """
    import logging

    from ..parallel.pp import from_sequential_params, to_sequential_params

    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(path / "state")  # layout-free restore
    saved = raw.get("params", {})
    want = state_template.params
    if isinstance(saved, dict) and set(saved) == {"stacked", "rest"} and not (
            isinstance(want, dict) and set(want) == {"stacked", "rest"}):
        n_layers = jax.tree.leaves(saved["stacked"])[0].shape[0]
        params = to_sequential_params(saved, n_layers)
    elif isinstance(want, dict) and set(want) == {"stacked", "rest"}:
        n_layers = jax.tree.leaves(want["stacked"])[0].shape[0]
        params = from_sequential_params(saved, n_layers)
    else:
        raise cause
    logging.getLogger("laryngeal_tpu").warning(
        "checkpoint %s restored across pipeline<->sequential layouts: params "
        "converted exactly; optimizer state reset to fresh (momentum lost — "
        "fine for inference/eval and warm starts, not for exact resume)", path)
    return {
        "step": raw.get("step", state_template.step),
        "params": params,
        "opt_state": state_template.opt_state,
        "batch_stats": raw.get("batch_stats", state_template.batch_stats),
    }


def find_resume_checkpoint(log_dir, model_name: str) -> Optional[str]:
    """Newest resumable checkpoint under ``log_dir`` for ``--resume auto``:
    scans ``{model}-classifier-*/`` experiment dirs for rolling ``latest``
    checkpoints (preferred — they carry the last *epoch*) falling back to
    ``best_model``; returns the most recently modified, or None."""
    base = Path(log_dir)
    if not base.exists():
        return None
    candidates = []
    for exp in base.glob(f"{model_name}-classifier-*"):
        for name in ("latest", "best_model"):
            ck = exp / name
            if (ck / "metadata.json").exists():
                # 'latest' wins over 'best_model' of the same run when both
                # exist at equal recency (epoch counter is >=).
                candidates.append((ck.stat().st_mtime, name == "latest", ck))
    if not candidates:
        return None
    candidates.sort()
    return str(candidates[-1][2])


def load_checkpoint(path, state_template: TrainState) -> Dict[str, Any]:
    """Restore {state, epoch, history, config, class_labels} from `path`.

    ``state_template`` provides the pytree structure/shapes (an initialized
    TrainState from the same model/optimizer).
    """
    path = Path(path).absolute()
    try:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(
                path / "state", _state_pytree(state_template)
            )
    except Exception as e:
        restored = _restore_cross_layout(path, state_template, cause=e)
    state = state_template.replace(
        step=restored["step"],
        params=restored["params"],
        opt_state=restored["opt_state"],
        batch_stats=restored["batch_stats"],
    )
    meta_path = path / "metadata.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    return {
        "state": state,
        "epoch": meta.get("epoch", 0),
        "history": meta.get("history", {}),
        "config": meta.get("config", {}),
        "class_labels": meta.get("class_labels", []),
    }
