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
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.samplers import FrameSampler
from ..data.video import decode_frames, get_video_properties
from ..models.registry import create_model, get_model_spec
from ..preprocess.transforms import batch_preprocess
from ..train.losses import probs_fn
from ..train.state import create_train_state
from ..train.checkpoint import load_checkpoint

DEFAULT_CLASSES = ["non_referral", "referral"]


class Predictor:
    def __init__(self, model, spec, state, class_labels=None,
                 num_frames: int = 32, sampling_method: str = "uniform",
                 crop_size: int = 224, logger=None):
        self.model = model
        self.spec = spec
        self.state = state
        self.class_labels = list(class_labels or DEFAULT_CLASSES)
        self.num_frames = num_frames
        self.sampling_method = sampling_method
        self.crop_size = crop_size
        self.logger = logger or logging.getLogger(__name__)
        self.sampler = FrameSampler(
            sampling_method, num_frames, per_video_seed=spec.per_video_seed
        )
        get_probs = probs_fn(spec.loss)
        regime = spec.preprocess_regime

        def forward(params, batch_stats, pixel_u8):
            clips = batch_preprocess(pixel_u8, regime, train=False, crop=crop_size)
            variables = {"params": params}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            logits = model.apply(variables, clips, train=False)
            return get_probs(logits)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, model_name: str, checkpoint_path,
                        num_frames: Optional[int] = None,
                        sampling_method: str = "uniform",
                        num_classes: int = 2, crop_size: Optional[int] = None,
                        image_size: Optional[int] = None,
                        model_size: str = "tiny", hidden_size: int = 256,
                        num_layers: int = 2, logger=None,
                        model_kwargs: Optional[Dict] = None) -> "Predictor":
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
                   num_frames, sampling_method, resolution, logger)

    def extract_clip_with_indices(self, video_path):
        total_frames, *_ = get_video_properties(video_path)
        indices = self.sampler(str(video_path), total_frames)
        clip = decode_frames(video_path, indices,
                             resize_to=(self.crop_size, self.crop_size))
        return clip, indices, total_frames

    def extract_clip(self, video_path) -> np.ndarray:
        return self.extract_clip_with_indices(video_path)[0]

    def predict_clip(self, clip_u8: np.ndarray) -> np.ndarray:
        """(T,H,W,C) or (B,T,H,W,C) uint8 -> (B, num_classes) probabilities."""
        if clip_u8.ndim == 4:
            clip_u8 = clip_u8[None]
        probs = self._forward(self.state.params, self.state.batch_stats,
                              jnp.asarray(clip_u8))
        return np.asarray(probs)

    def _result(self, video_path, probs, indices, total_frames) -> Dict:
        pred = int(np.argmax(probs))
        class_name = (self.class_labels[pred]
                      if pred < len(self.class_labels) else str(pred))
        # Result schema: vivit_transformer/inference.py:225-248.
        return {
            "video_path": str(video_path),
            "predicted_class": class_name,
            "class_id": pred,
            "confidence": float(probs[pred]),
            "probabilities": {c: float(probs[i])
                              for i, c in enumerate(self.class_labels)},
            "class_mapping": {str(i): c for i, c in enumerate(self.class_labels)},
            "sampling_method": self.sampling_method,
            "num_frames": self.num_frames,
            "frame_indices": list(indices),
            "total_frames": int(total_frames),
            "timestamp": datetime.now().isoformat(),
        }

    def predict_video(self, video_path) -> Dict:
        clip, indices, total_frames = self.extract_clip_with_indices(video_path)
        probs = self.predict_clip(clip)[0]
        return self._result(video_path, probs, indices, total_frames)

    def predict_videos(self, video_paths, batch_size: int = 4,
                       prefetch: int = 2, num_workers: Optional[int] = None):
        """Throughput batch mode: serial sampling (RNG-order parity), pooled
        decode, prefetched device batches, ONE jitted batched forward shape,
        probabilities fetched once at the end. Per-video result dicts are
        identical to ``predict_video``'s; unreadable videos are skipped with
        a warning (the reference batch mode's per-video try/except,
        resnet50-2d-lstm/inference.py:263-276)."""
        import os
        import queue
        import threading
        from concurrent.futures import ThreadPoolExecutor

        from ..data.native import decode_frames_auto

        # Plan serially so stream-seeded samplers match dataset iteration.
        plans = []
        for p in video_paths:
            try:
                total, *_ = get_video_properties(p)
                plans.append((str(p), self.sampler(str(p), total), int(total)))
            except Exception as e:
                self.logger.warning("Skipping unreadable video %s: %s", p, e)
        if not plans:
            return []

        hw = (self.crop_size, self.crop_size)

        def decode(plan):
            path, idx, total = plan
            try:
                return decode_frames_auto(path, idx, resize_to=hw)
            except Exception as e:
                self.logger.warning("Decode failed for %s: %s — skipped", path, e)
                return None

        workers = max(1, num_workers or min(4, os.cpu_count() or 1))
        q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        sentinel = object()

        def producer():
            try:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    batch_plans, batch_clips = [], []
                    # Decode one batch-worth at a time: submitting every plan
                    # up front would buffer the whole tree's decoded clips
                    # (~5 MB each) ahead of the consumer — the queue bound
                    # must cover decode output, not just device batches.
                    for start in range(0, len(plans), batch_size):
                        chunk = plans[start:start + batch_size]
                        for plan, clip in zip(chunk, pool.map(decode, chunk)):
                            if clip is None:
                                continue
                            batch_plans.append(plan)
                            batch_clips.append(clip)
                            if len(batch_clips) == batch_size:
                                q.put((batch_plans,
                                       jnp.asarray(np.stack(batch_clips))))
                                batch_plans, batch_clips = [], []
                    if batch_clips:
                        n_real = len(batch_clips)
                        while len(batch_clips) < batch_size:  # keep ONE jit shape
                            batch_clips.append(batch_clips[-1])
                        q.put((batch_plans[:n_real],
                               jnp.asarray(np.stack(batch_clips))))
            finally:
                q.put(sentinel)

        threading.Thread(target=producer, daemon=True).start()
        out_plans, out_probs = [], []
        while True:
            item = q.get()
            if item is sentinel:
                break
            bplans, pixel = item
            probs = self._forward(self.state.params, self.state.batch_stats, pixel)
            out_plans.extend(bplans)
            out_probs.append(probs[: len(bplans)])
        if not out_plans:
            return []
        all_probs = np.asarray(jax.device_get(jnp.concatenate(out_probs, axis=0)))
        return [self._result(path, all_probs[i], idx, total)
                for i, (path, idx, total) in enumerate(out_plans)]
