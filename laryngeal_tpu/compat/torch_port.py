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
    # Copy: torch's .numpy() returns a VIEW of the tensor storage, and CPU
    # jax can zero-copy alias numpy buffers — without the copy, later
    # in-place torch optimizer updates would silently mutate the converted
    # Flax params.
    return np.array(v, copy=True)


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


def resize_time_embeddings(emb: np.ndarray, t_new: int) -> np.ndarray:
    """Linearly interpolate a (1, T, D) temporal embedding to T=t_new.

    Used when porting the 8-frame k400 TimeSformer checkpoint into the
    reference's default 32-frame fine-tune config (timesformer/main.py:39).
    The reference relies on HF ``ignore_mismatched_sizes=True``, which
    *re-initializes* the mismatched table randomly
    (timesformer/.../models/timesformer_model.py:27-43); interpolation keeps
    the pretrained temporal prior — a deliberate, documented improvement."""
    t_old = emb.shape[1]
    if t_old == t_new:
        return emb
    x = np.linspace(0.0, t_old - 1.0, t_new)
    i0 = np.floor(x).astype(np.int64)
    i1 = np.minimum(i0 + 1, t_old - 1)
    w = (x - i0)[None, :, None].astype(np.float32)
    out = emb[:, i0] * (1.0 - w) + emb[:, i1] * w
    return out.astype(emb.dtype)


def batchnorm(state: Mapping, prefix: str):
    """-> (params {scale,bias}, stats {mean,var})."""
    params = {"scale": _np(state, f"{prefix}.weight"), "bias": _np(state, f"{prefix}.bias")}
    stats = {"mean": _np(state, f"{prefix}.running_mean"), "var": _np(state, f"{prefix}.running_var")}
    return params, stats


def _conv_nd(state: Mapping, prefix: str) -> Dict:
    w = _np(state, f"{prefix}.weight")
    if w.ndim == 4:
        return {"kernel": w.transpose(2, 3, 1, 0)}
    return {"kernel": w.transpose(2, 3, 4, 1, 0)}


def port_resnet50_trunk(state: Mapping, prefix: str = "", sequential: bool = False):
    """torchvision resnet50 trunk -> (params, batch_stats) for models.resnet.ResNet50.

    sequential=True maps the reference's ``nn.Sequential(*children[:-1])``
    key layout (resnet50.0=conv1, .1=bn1, .4-.7=layer1-4;
    resnet50-2d-lstm/src/models/model.py:11-13); otherwise plain torchvision
    names (conv1, bn1, layer1..4).
    """
    if sequential:
        name_conv1, name_bn1 = f"{prefix}0", f"{prefix}1"
        layer_names = [f"{prefix}{i}" for i in (4, 5, 6, 7)]
    else:
        name_conv1, name_bn1 = f"{prefix}conv1", f"{prefix}bn1"
        layer_names = [f"{prefix}layer{i}" for i in (1, 2, 3, 4)]

    params: Dict = {"conv1": _conv_nd(state, name_conv1)}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = batchnorm(state, name_bn1)

    stage_sizes = (3, 4, 6, 3)
    for stage, (lname, blocks) in enumerate(zip(layer_names, stage_sizes)):
        for i in range(blocks):
            p = f"{lname}.{i}"
            bp: Dict = {}
            bs: Dict = {}
            for j in (1, 2, 3):
                bp[f"conv{j}"] = _conv_nd(state, f"{p}.conv{j}")
                bp[f"bn{j}"], bs[f"bn{j}"] = batchnorm(state, f"{p}.bn{j}")
            if f"{p}.downsample.0.weight" in state:
                bp["downsample_conv"] = _conv_nd(state, f"{p}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = batchnorm(state, f"{p}.downsample.1")
            key = f"layer{stage + 1}_{i}"
            params[key] = bp
            stats[key] = bs
    return params, stats


def port_lstm(state: Mapping, prefix: str, num_layers: int) -> Dict:
    """torch nn.LSTM -> models.resnet.LSTM params (same (i,f,g,o) gate order)."""
    out: Dict = {}
    for k in range(num_layers):
        out[f"w_ih_l{k}"] = _np(state, f"{prefix}.weight_ih_l{k}").T
        out[f"w_hh_l{k}"] = _np(state, f"{prefix}.weight_hh_l{k}").T
        out[f"b_ih_l{k}"] = _np(state, f"{prefix}.bias_ih_l{k}")
        out[f"b_hh_l{k}"] = _np(state, f"{prefix}.bias_hh_l{k}")
    return out


def port_resnet50_lstm(state: Mapping, num_layers: int = 2):
    """Reference VideoResNet50LSTM state_dict -> {'params':..., 'batch_stats':...}."""
    trunk_params, trunk_stats = port_resnet50_trunk(state, prefix="resnet50.", sequential=True)
    params = {
        "resnet50": trunk_params,
        "lstm": port_lstm(state, "lstm", num_layers),
        "fc1": linear(state, "classifier.0"),
        "fc2": linear(state, "classifier.3"),
    }
    return {"params": params, "batch_stats": {"resnet50": trunk_stats}}


def _conv_bn(state: Mapping, prefix: str):
    """ultralytics Conv (conv+bn+silu) -> our ConvBnSiLU params/stats."""
    p = {"conv": _conv_nd(state, f"{prefix}.conv")}
    p["bn"], s = batchnorm(state, f"{prefix}.bn")
    return p, {"bn": s}


def _c3(state: Mapping, prefix: str, n_inner: int):
    params: Dict = {}
    stats: Dict = {}
    for name in ("cv1", "cv2", "cv3"):
        params[name], stats[name] = _conv_bn(state, f"{prefix}.{name}")
    for i in range(n_inner):
        bp: Dict = {}
        bs: Dict = {}
        bp["cv1"], bs["cv1"] = _conv_bn(state, f"{prefix}.m.{i}.cv1")
        bp["cv2"], bs["cv2"] = _conv_bn(state, f"{prefix}.m.{i}.cv2")
        params[f"m{i}"] = bp
        stats[f"m{i}"] = bs
    return params, stats


def port_yolov5(state: Mapping, size: str = "s", num_classes: int = 1):
    """ultralytics yolov5 state_dict (model.{i}.* naming, v6.x layout) ->
    {'params', 'batch_stats'} for models.yolov5.YoloV5."""
    import math as _math

    from ..models.yolov5 import MULTIPLES

    gd, _ = MULTIPLES[size]
    d = lambda n: max(round(n * gd), 1)

    # Strip common prefixes ("model.model." for DetectMultiBackend exports).
    keys = list(state.keys())
    prefix = ""
    for cand in ("model.model.", "model."):
        if any(k.startswith(cand + "0.") for k in keys):
            prefix = cand
            break

    layer_map = [
        ("b0", "conv", None), ("b1", "conv", None), ("b2", "c3", d(3)),
        ("b3", "conv", None), ("b4", "c3", d(6)), ("b5", "conv", None),
        ("b6", "c3", d(9)), ("b7", "conv", None), ("b8", "c3", d(3)),
        ("b9", "sppf", None), ("h10", "conv", None), (None, None, None),
        (None, None, None), ("h13", "c3", d(3)), ("h14", "conv", None),
        (None, None, None), (None, None, None), ("h17", "c3", d(3)),
        ("h18", "conv", None), (None, None, None), ("h20", "c3", d(3)),
        ("h21", "conv", None), (None, None, None), ("h23", "c3", d(3)),
    ]
    params: Dict = {}
    stats: Dict = {}
    for idx, (name, kind, n_inner) in enumerate(layer_map):
        if name is None:
            continue
        p = f"{prefix}{idx}"
        if kind == "conv":
            params[name], stats[name] = _conv_bn(state, p)
        elif kind == "c3":
            params[name], stats[name] = _c3(state, p, n_inner)
        elif kind == "sppf":
            sp: Dict = {}
            ss: Dict = {}
            sp["cv1"], ss["cv1"] = _conv_bn(state, f"{p}.cv1")
            sp["cv2"], ss["cv2"] = _conv_bn(state, f"{p}.cv2")
            params[name] = sp
            stats[name] = ss
    for li in range(3):
        dp = f"{prefix}24.m.{li}"
        params[f"detect{li}"] = {
            "kernel": _np(state, f"{dp}.weight").transpose(2, 3, 1, 0),
            "bias": _np(state, f"{dp}.bias"),
        }
    return {"params": params, "batch_stats": stats}


def port_swin3d(state: Mapping, depths=(2, 2, 6, 2)):
    """torchvision SwinTransformer3d state_dict -> Flax params for
    models.swin3d.SwinTransformer3D (the swin3d_t/s/b weights the reference
    fine-tunes, videoswintransformer/.../models/swin3d.py:7-53).

    torchvision layout: patch_embed.{proj,norm}; features[0,2,4,6] = stages
    (blocks: norm1, attn.{qkv,proj,relative_position_bias_table}, norm2,
    mlp.{0,3}); features[1,3,5] = PatchMerging {reduction, norm}; final
    norm + head.
    """
    params: Dict = {
        "patch_embed_proj": conv3d(state, "patch_embed.proj"),
        "patch_embed_norm": layernorm(state, "patch_embed.norm"),
        "norm": layernorm(state, "norm"),
        "head": linear(state, "head"),
    }
    for stage, depth in enumerate(depths):
        feat = stage * 2
        for i in range(depth):
            p = f"features.{feat}.{i}"
            params[f"stage{stage + 1}_block{i}"] = {
                "norm1": layernorm(state, f"{p}.norm1"),
                "attn": {
                    "qkv": linear(state, f"{p}.attn.qkv"),
                    "proj": linear(state, f"{p}.attn.proj"),
                    "relative_position_bias_table": _np(
                        state, f"{p}.attn.relative_position_bias_table"),
                },
                "norm2": layernorm(state, f"{p}.norm2"),
                "mlp_fc1": linear(state, f"{p}.mlp.0"),
                "mlp_fc2": linear(state, f"{p}.mlp.3"),
            }
        if stage < len(depths) - 1:
            m = f"features.{feat + 1}"
            params[f"merge{stage + 1}"] = {
                "norm": layernorm(state, f"{m}.norm"),
                "reduction": linear(state, f"{m}.reduction"),
            }
    return params


def port_resnet3d(state: Mapping, stage_sizes=(3, 4, 6, 3)):
    """pytorchvideo create_resnet state_dict -> {'params','batch_stats'} for
    models.resnet3d.ResNet3D (resnet50-3d-video/.../models/resnet3d.py:4-49).

    pytorchvideo layout: blocks.0 = stem {conv, norm}; blocks.1-4 = stages of
    res_blocks with branch1_{conv,norm} shortcut and branch2
    {conv,norm}_{a,b,c}; blocks.5 = head {proj}.
    """
    params: Dict = {"stem_conv": _conv_nd(state, "blocks.0.conv")}
    stats: Dict = {}
    params["stem_bn"], stats["stem_bn"] = batchnorm(state, "blocks.0.norm")
    for stage, blocks in enumerate(stage_sizes):
        for i in range(blocks):
            p = f"blocks.{stage + 1}.res_blocks.{i}"
            bp: Dict = {}
            bs: Dict = {}
            for br in ("a", "b", "c"):
                bp[f"conv_{br}"] = _conv_nd(state, f"{p}.branch2.conv_{br}")
                bp[f"bn_{br}"], bs[f"bn_{br}"] = batchnorm(state, f"{p}.branch2.norm_{br}")
            if f"{p}.branch1_conv.weight" in state:
                bp["shortcut_conv"] = _conv_nd(state, f"{p}.branch1_conv")
                bp["shortcut_bn"], bs["shortcut_bn"] = batchnorm(state, f"{p}.branch1_norm")
            params[f"stage{stage + 1}_{i}"] = bp
            stats[f"stage{stage + 1}_{i}"] = bs
    params["proj"] = linear(state, "blocks.5.proj")
    return {"params": params, "batch_stats": stats}
