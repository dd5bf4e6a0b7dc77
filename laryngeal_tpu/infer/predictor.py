"""Predictor — single jitted decode->preprocess->backbone->probs graph.

Replaces the reference's five inference.py stacks (HF shape
``vivit_transformer/inference.py:31-320``, CNN shape
``resnet50-3d-video/inference.py:356-423``): checkpoint load, sampling-index
re-derivation, frame extraction, forward, softmax/sigmoid, JSON result.
Decode stays on host; everything from uint8 frames onward is one XLA graph
reused across videos (static clip shape => compiled once).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..data.samplers import FrameSampler
from ..models.registry import create_model, get_model_spec
from ..preprocess.transforms import batch_preprocess, decode_wire_batch
from ..train.losses import probs_fn
from ..train.state import create_train_state
from ..train.checkpoint import load_checkpoint
from .base import VideoPredictorBase

DEFAULT_CLASSES = ["non_referral", "referral"]


class Predictor(VideoPredictorBase):
    def __init__(self, model, spec, state, class_labels=None,
                 num_frames: int = 32, sampling_method: str = "uniform",
                 crop_size: int = 224, logger=None, wire: str = "rgb",
                 wire_quality: int = 75, wire_keep_ac: int = 31,
                 wire_pack_from: int = 14, wire_lowres: int = 0,
                 mesh=None):
        self.model = model
        self.spec = spec
        self.state = state
        self.class_labels = list(class_labels or DEFAULT_CLASSES)
        self.num_frames = num_frames
        self.sampling_method = sampling_method
        self.crop_size = crop_size
        self.logger = logger or logging.getLogger(__name__)
        # Serving wire (same transport as the training feed / bench): the
        # clip payload rides as rgb / i420 / delta / dct / dctp and the wire
        # decode fuses into this jitted forward (decode_wire_batch). dct and
        # dctp are lossy with drift pinned in BASELINE.md's wire studies.
        self.wire = wire
        self.wire_quality = int(wire_quality)
        self.wire_keep_ac = int(wire_keep_ac)
        self.wire_pack_from = int(wire_pack_from)
        # Reduced-geometry decode+wire (VideoPredictorBase.wire_lowres):
        # the payload carries (crop >> n) pixels and batch_preprocess's
        # resize-from-any-size semantics restore the model input. rgb wire
        # ignores it (full-res decode straight to the model geometry).
        self.wire_lowres = int(wire_lowres) if wire != "rgb" else 0
        self.sampler = FrameSampler(
            sampling_method, num_frames, per_video_seed=spec.per_video_seed
        )
        get_probs = probs_fn(spec.loss)
        regime = spec.preprocess_regime
        whw = self._wire_hw()
        wire_hw = (whw, whw)

        def forward(params, batch_stats, payload):
            pixel = decode_wire_batch(payload, wire, wire_hw,
                                      self.wire_quality, self.wire_keep_ac)
            clips = batch_preprocess(pixel, regime, train=False, crop=crop_size)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, clips, train=False)
            return get_probs(logits)

        if mesh is not None:
            # Batch-sharded inference: the clip payload (any wire) shards
            # over the mesh's data axis, params/stats replicate, and probs
            # come back replicated. Batch size must be a multiple of the
            # data-axis size (predict_videos pads its final batch anyway).
            from ..parallel.mesh import (batch_sharding, replicate,
                                         replicated_sharding)

            rep = replicated_sharding(mesh)
            data = batch_sharding(mesh)
            self.state = state = state.replace(
                params=replicate(mesh, state.params),
                batch_stats=replicate(mesh, state.batch_stats))
            self._forward = jax.jit(forward, in_shardings=(rep, rep, data),
                                    out_shardings=rep)
        else:
            self._forward = jax.jit(forward)
        self.mesh = mesh

    @classmethod
    def from_checkpoint(cls, model_name: str, checkpoint_path,
                        num_frames: Optional[int] = None,
                        sampling_method: str = "uniform",
                        num_classes: int = 2, crop_size: Optional[int] = None,
                        image_size: Optional[int] = None,
                        model_size: str = "tiny", hidden_size: int = 256,
                        num_layers: int = 2, logger=None,
                        model_kwargs: Optional[Dict] = None,
                        wire: str = "rgb", wire_quality: int = 75,
                        wire_keep_ac: int = 31,
                        wire_pack_from: int = 14,
                        wire_lowres: int = 0) -> "Predictor":
        spec = get_model_spec(model_name)

        # Checkpoint metadata may pin the exact architecture (written by
        # scripts/port_weights.py and the training CLI); explicit caller
        # arguments win, metadata fills the gaps, spec defaults last.
        import json

        meta_path = Path(checkpoint_path) / "metadata.json"
        meta_cfg = {}
        if meta_path.exists():
            meta_cfg = json.loads(meta_path.read_text()).get("config", {})
        saved_kwargs = dict(meta_cfg.get("model_kwargs", {}))
        saved_num_frames = saved_kwargs.pop("num_frames", None)
        saved_image = saved_kwargs.pop("image_size", None)

        num_frames = num_frames or saved_num_frames or spec.default_num_frames
        # One resolution drives the model config, the template input, AND the
        # decode/preprocess crop — they must agree or patch counts mismatch.
        resolution = (crop_size or image_size or saved_image
                      or meta_cfg.get("crop_size") or 224)

        kwargs = dict(num_classes=num_classes)
        if model_name in ("vivit", "timesformer"):
            kwargs.update(num_frames=num_frames, image_size=resolution)
        if model_name == "swin3d":
            kwargs.update(model_size=model_size)
        if model_name == "resnet50_lstm":
            kwargs.update(hidden_size=hidden_size, num_layers=num_layers)
        kwargs.update(saved_kwargs)
        kwargs.update(model_kwargs or {})
        model = create_model(model_name, **kwargs)

        template = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, num_frames, resolution, resolution, 3), jnp.float32),
            optimizer=spec.optimizer, learning_rate=spec.default_lr,
            weight_decay=spec.default_weight_decay,
            trainable_mask_fn=None,
        )
        restored = load_checkpoint(checkpoint_path, template)
        class_labels = restored["class_labels"] or DEFAULT_CLASSES
        return cls(model, spec, restored["state"], class_labels,
                   num_frames, sampling_method, resolution, logger,
                   wire=wire, wire_quality=wire_quality,
                   wire_keep_ac=wire_keep_ac, wire_pack_from=wire_pack_from,
                   wire_lowres=wire_lowres)
