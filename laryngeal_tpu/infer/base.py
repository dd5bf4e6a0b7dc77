"""Host-side predictor machinery shared by checkpoint- and artifact-backed
inference.

Everything here touches only sampling, decode, batching, and the result
schema — no model zoo, converters, or training stack — so the AOT-artifact
path (``infer.export``) can serve with just this module, jax, and cv2.
Subclasses provide: ``state`` (with ``params``/``batch_stats`` attributes,
may be ``None`` placeholders), ``_forward(params, batch_stats, pixel_u8)``,
``sampler``, ``class_labels``, ``num_frames``, ``sampling_method``,
``crop_size``, ``logger``.

Result schema parity: ``vivit_transformer/inference.py:225-248`` (single)
and ``resnet50-2d-lstm/inference.py:250-351`` (batch skip semantics).
"""

from __future__ import annotations

from datetime import datetime
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.video import decode_frames, get_video_properties


class VideoPredictorBase:
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

    def save_sampled_frames(self, log_dir) -> Optional[str]:
        """CSV audit of the indices every prediction this session sampled —
        ``inference_sampled_frames_{method}.csv``, the reference's
        inference-side reproducibility dump (resnet50-3d-video/
        inference.py:206-245). The dynamic_fps column is blank: this
        framework's samplers handle short videos in index space
        (data/samplers.py), not by retiming."""
        import csv
        import os

        records = getattr(self, "_sampled_records", None)
        if not log_dir or not records:
            return None
        path = os.path.join(
            str(log_dir),
            f"inference_sampled_frames_{self.sampling_method}.csv")
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["video_filename", "total_frames", "sampled_frames",
                         "dynamic_fps"])
            for vp in sorted(records):
                total, idx = records[vp]
                wr.writerow([os.path.basename(vp), total,
                             ",".join(map(str, idx)), ""])
        self.logger.info("Saved %d sampled frame records to %s",
                         len(records), path)
        return path

    def _result(self, video_path, probs, indices, total_frames) -> Dict:
        if not hasattr(self, "_sampled_records"):
            self._sampled_records = {}
        self._sampled_records[str(video_path)] = (int(total_frames),
                                                  list(indices))
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
