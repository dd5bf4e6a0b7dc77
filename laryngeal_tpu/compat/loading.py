"""Load converted torch weights into a TrainState (gated on availability)."""

from __future__ import annotations

from typing import Any

import numpy as np


def load_torch_state_dict(path):
    """Load a torch .pth/.pt (if torch importable) or .npz state dict."""
    path = str(path)
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model_state_dict" in obj:
        obj = obj["model_state_dict"]  # reference checkpoint dicts
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    # Strip DataParallel prefixes (reference inference loaders tolerate both,
    # resnet50-3d-video/inference.py:55-60).
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}


def reconcile_params(current, converted, logger=None, context=""):
    """Shape-reconcile a converted torch param tree against the model's own.

    Mirrors the reference's reliance on HF ``ignore_mismatched_sizes=True``
    (model_configuration.py:39, vivit_transformer/.../models/vivit_model.py:
    26-41): leaves whose shapes differ from the freshly initialized model —
    typically the 400-class Kinetics classifier head vs our 2-class head —
    keep the model's fresh init. One deliberate improvement over the
    reference: mismatched ``time_embeddings`` tables are linearly
    interpolated instead of discarded (torch_port.resize_time_embeddings).
    """
    from flax import traverse_util

    from .torch_port import resize_time_embeddings

    flat_cur = traverse_util.flatten_dict(current)
    flat_new = traverse_util.flatten_dict(converted)
    out = dict(flat_cur)
    dropped, interped = [], []
    for k, v in flat_new.items():
        v = np.asarray(v)
        cur = flat_cur.get(k)
        if cur is not None and tuple(np.shape(cur)) != tuple(v.shape):
            name = "/".join(str(x) for x in k)
            if "time_embeddings" in k:
                v = resize_time_embeddings(v, int(np.shape(cur)[1]))
                interped.append(name)
            else:
                dropped.append(name)
                continue
        out[k] = v
    missing = sorted("/".join(str(x) for x in k)
                     for k in flat_cur if k not in flat_new)
    if logger:
        if missing:
            logger.warning(
                "%s%d model tensors absent from the converted checkpoint "
                "keep RANDOM init (depth/width mismatch?): %s", context,
                len(missing), ", ".join(missing[:12]) +
                (" ..." if len(missing) > 12 else ""))
        if interped:
            logger.info("%sInterpolated temporal embeddings: %s", context,
                        ", ".join(interped))
        if dropped:
            logger.warning(
                "%sKept fresh init for shape-mismatched tensors (the "
                "reference re-initializes these via "
                "ignore_mismatched_sizes=True): %s", context,
                ", ".join(dropped))
    return traverse_util.unflatten_dict(out)


def load_torch_weights_into_state(state, model_name: str, path, logger=None,
                                  sd=None) -> Any:
    """Convert a torch checkpoint for `model_name` and install it in `state`.

    Pass a pre-loaded state dict via `sd` to avoid deserializing a large
    .pth twice when the caller already read it for shape inference."""
    from . import torch_port as tp

    if sd is None:
        sd = load_torch_state_dict(path)
    n_layers = len({k.split(".")[3] for k in sd if ".encoder.layer." in k}) or 12
    if model_name == "vivit":
        new = {"params": tp.port_vivit(sd, num_layers=n_layers)}
    elif model_name == "timesformer":
        new = {"params": tp.port_timesformer(sd, num_layers=n_layers)}
    elif model_name == "resnet50_lstm":
        new = tp.port_resnet50_lstm(sd)
    elif model_name == "swin3d":
        # Infer stage depths from the torchvision feature indices.
        depths = []
        for stage in range(4):
            idxs = {int(k.split(".")[2]) for k in sd
                    if k.startswith(f"features.{stage * 2}.")}
            if idxs:
                depths.append(1 + max(idxs))
        new = {"params": tp.port_swin3d(sd, depths=tuple(depths))}
    elif model_name == "resnet3d":
        sizes = []
        for stage in range(1, 5):
            idxs = {int(k.split(".")[3]) for k in sd
                    if k.startswith(f"blocks.{stage}.res_blocks.")}
            if idxs:
                sizes.append(1 + max(idxs))
        new = tp.port_resnet3d(sd, stage_sizes=tuple(sizes))
    else:
        raise NotImplementedError(
            f"torch weight conversion for {model_name!r} not yet wired")
    if logger:
        logger.info("Loaded torch weights from %s (%d tensors)", path, len(sd))
    state = state.replace(params=reconcile_params(
        state.params, new["params"], logger=logger,
        context=f"{model_name}: "))
    if "batch_stats" in new:
        state = state.replace(batch_stats=new["batch_stats"])
    return state
