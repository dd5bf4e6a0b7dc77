"""Torch/HF -> Flax weight converters.

Weight-porting is the parity linchpin (SURVEY.md §7 "hard parts"): the
reference fine-tunes pretrained backbones, so our Flax models must load the
same weights bit-for-bit. Converters take a *numpy-ified* torch ``state_dict``
(no torch import required at call time) and emit the Flax param pytree.

Conventions:
- torch ``Linear.weight`` (out,in) -> flax Dense ``kernel`` (in,out): transpose.
- torch ``Conv3d.weight`` (out,in,kT,kH,kW) -> flax Conv kernel
  (kT,kH,kW,in,out): transpose (2,3,4,1,0).
- torch ``Conv2d.weight`` (out,in,kH,kW) -> (kH,kW,in,out): transpose (2,3,1,0).
- torch LayerNorm/BatchNorm ``weight``/``bias`` -> ``scale``/``bias``.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(state: Mapping, key: str) -> np.ndarray:
    v = state[key]
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def linear(state: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(state, f"{prefix}.weight").T}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state, f"{prefix}.bias")
    return out


def layernorm(state: Mapping, prefix: str) -> Dict:
    return {"scale": _np(state, f"{prefix}.weight"), "bias": _np(state, f"{prefix}.bias")}


def conv3d(state: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(state, f"{prefix}.weight").transpose(2, 3, 4, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state, f"{prefix}.bias")
    return out


def conv2d(state: Mapping, prefix: str) -> Dict:
    out = {"kernel": _np(state, f"{prefix}.weight").transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in state:
        out["bias"] = _np(state, f"{prefix}.bias")
    return out


def _vit_block(state: Mapping, p: str) -> Dict:
    """One HF ViT-style encoder layer -> our TransformerBlock params."""
    return {
        "attention": {
            "query": linear(state, f"{p}.attention.attention.query"),
            "key": linear(state, f"{p}.attention.attention.key"),
            "value": linear(state, f"{p}.attention.attention.value"),
            "out": linear(state, f"{p}.attention.output.dense"),
        },
        "mlp": {
            "fc1": linear(state, f"{p}.intermediate.dense"),
            "fc2": linear(state, f"{p}.output.dense"),
        },
        "layernorm_before": layernorm(state, f"{p}.layernorm_before"),
        "layernorm_after": layernorm(state, f"{p}.layernorm_after"),
    }


def port_vivit(state: Mapping, num_layers: int = 12) -> Dict:
    """HF VivitForVideoClassification state_dict -> Flax params
    (models/vivit.py). Covers the checkpoint the reference fine-tunes
    (vivit_transformer/.../models/vivit_model.py:26-41)."""
    params: Dict = {
        "embeddings": {
            "cls_token": _np(state, "vivit.embeddings.cls_token"),
            "position_embeddings": _np(state, "vivit.embeddings.position_embeddings"),
            "projection": conv3d(state, "vivit.embeddings.patch_embeddings.projection"),
        },
        "layernorm": layernorm(state, "vivit.layernorm"),
        "classifier": linear(state, "classifier"),
    }
    for i in range(num_layers):
        params[f"layer_{i}"] = _vit_block(state, f"vivit.encoder.layer.{i}")
    return params


def port_timesformer(state: Mapping, num_layers: int = 12) -> Dict:
    """HF TimesformerForVideoClassification state_dict -> Flax params
    (models/timesformer.py)."""
    params: Dict = {
        "embeddings": {
            "cls_token": _np(state, "timesformer.embeddings.cls_token"),
            "position_embeddings": _np(state, "timesformer.embeddings.position_embeddings"),
            "time_embeddings": _np(state, "timesformer.embeddings.time_embeddings"),
            "projection": conv2d(state, "timesformer.embeddings.patch_embeddings.projection"),
        },
        "layernorm": layernorm(state, "timesformer.layernorm"),
        "classifier": linear(state, "classifier"),
    }
    for i in range(num_layers):
        p = f"timesformer.encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "attention": {
                "qkv": linear(state, f"{p}.attention.attention.qkv"),
                "out": linear(state, f"{p}.attention.output.dense"),
            },
            "temporal_attention": {
                "qkv": linear(state, f"{p}.temporal_attention.attention.qkv"),
                "out": linear(state, f"{p}.temporal_attention.output.dense"),
            },
            "temporal_dense": linear(state, f"{p}.temporal_dense"),
            "mlp_fc1": linear(state, f"{p}.intermediate.dense"),
            "mlp_fc2": linear(state, f"{p}.output.dense"),
            "layernorm_before": layernorm(state, f"{p}.layernorm_before"),
            "temporal_layernorm": layernorm(state, f"{p}.temporal_layernorm"),
            "layernorm_after": layernorm(state, f"{p}.layernorm_after"),
        }
    return params
