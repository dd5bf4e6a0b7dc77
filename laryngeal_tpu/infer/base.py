"""Host-side predictor machinery shared by checkpoint- and artifact-backed
inference.

Everything here touches only sampling, decode, batching, and the result
schema — no model zoo, converters, or training stack — so the AOT-artifact
path (``infer.export``) can serve with just this module, jax, and cv2.
Subclasses provide: ``state`` (with ``params``/``batch_stats`` attributes,
may be ``None`` placeholders), ``_forward(params, batch_stats, payload)``
(``payload`` is the batched wire payload — a pixel array on the default
rgb wire), ``sampler``, ``class_labels``, ``num_frames``,
``sampling_method``, ``crop_size``, ``logger``; optionally the ``wire*``
attributes (see class defaults) to ship clips transform-coded.

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
    # Host->device wire format for the clip payload (same transport as the
    # training feed / bench serving wire — decode fuses into the jitted
    # forward via preprocess.transforms.decode_wire_batch). Subclasses that
    # support it (Predictor) override these in __init__; the AOT-artifact
    # path stays on the rgb wire (the artifact's input signature is baked).
    wire: str = "rgb"
    wire_quality: int = 75
    wire_keep_ac: int = 31
    wire_pack_from: int = 14
    # Reduced-resolution decode for the non-rgb wires (native mpeg4
    # `lowres`): the host decodes, wire-encodes and ships (crop >> n)
    # geometry and the jitted preprocess resizes back to the model input —
    # serving decode is the throughput wall on CPU-poor hosts and lowres1
    # cuts it ~4x in transform work (drift pinned in BASELINE.md's round-4
    # lowres study; same accounting as the dct wire's quantization).
    wire_lowres: int = 0

    def _wire_hw(self) -> int:
        return self.crop_size >> (self.wire_lowres
                                  if self.wire != "rgb" else 0)

    def extract_clip_with_indices(self, video_path):
        total_frames, *_ = get_video_properties(video_path)
        indices = self.sampler(str(video_path), total_frames)
        if self.wire != "rgb":
            # Non-rgb wires ride I420 planes — decode natively as 4:2:0
            # (the codec's own representation; no RGB roundtrip), at the
            # wire's (possibly lowres-reduced) geometry.
            from ..data.native import decode_frames_auto

            w = self._wire_hw()
            clip = decode_frames_auto(video_path, indices, resize_to=(w, w),
                                      fmt="i420", lowres=self.wire_lowres)
        else:
            hw = (self.crop_size, self.crop_size)
            clip = decode_frames(video_path, indices, resize_to=hw)
        return clip, indices, total_frames

    def extract_clip(self, video_path) -> np.ndarray:
        return self.extract_clip_with_indices(video_path)[0]

    def _encode_wire(self, i420: np.ndarray):
        """Single-clip host-side wire encode: I420 (T,H*3/2,W) -> payload."""
        if self.wire == "i420":
            return i420
        if self.wire == "delta":
            from ..preprocess.transforms import temporal_delta_encode

            return temporal_delta_encode(i420)
        if self.wire == "dct":
            from ..preprocess.dct_wire import encode_clip

            return encode_clip(i420, self.wire_quality, self.wire_keep_ac)
        if self.wire == "dctp":
            from ..preprocess.dct_wire import encode_clip_packed

            return encode_clip_packed(i420, self.wire_quality,
                                      self.wire_keep_ac, self.wire_pack_from)
        raise ValueError(f"unknown wire {self.wire!r}")

    def _stack_payload(self, clips):
        """List of single clips in the wire's HOST format (rgb: (T,H,W,3)
        uint8; others: I420 (T,H*3/2,W) uint8) -> batched device payload."""
        if self.wire == "rgb":
            return jnp.asarray(np.stack(clips))
        payloads = [self._encode_wire(c) for c in clips]
        if isinstance(payloads[0], tuple):  # dct/dctp multi-part payloads
            return tuple(jnp.asarray(np.stack([p[i] for p in payloads]))
                         for i in range(len(payloads[0])))
        return jnp.asarray(np.stack(payloads))

    def predict_clip(self, clip_u8: np.ndarray) -> np.ndarray:
        """(T,H,W,3) or (B,T,H,W,3) RGB uint8 -> (B, num_classes)
        probabilities. On a non-rgb wire, RGB input is converted to I420
        host-side first (4:2:0 chroma subsampling — the same loss the
        video source already carries); I420 input (T,H*3/2,W) or
        (B,T,H*3/2,W) is accepted directly."""
        # Shape dispatch (round-3 ADVICE): on the rgb wire the rule is
        # ndim-only — any 4D clip is (T,H,W,C) unbatched, 5D batched — so
        # a (T,H,W,1) grayscale input is never mis-read as batched I420.
        # On non-rgb wires, last-dim==3 marks RGB; a trailing dim that
        # looks channel-like but isn't 3 is ambiguous and raises.
        if self.wire == "rgb":
            if clip_u8.ndim not in (4, 5):
                raise ValueError(
                    f"rgb wire expects (T,H,W,C) or (B,T,H,W,C); got "
                    f"shape {clip_u8.shape}")
            rgb_in, batched = True, clip_u8.ndim == 5
        elif clip_u8.ndim == 3:
            rgb_in, batched = False, False  # I420 (T, H*3/2, W)
        elif clip_u8.ndim == 5:
            if clip_u8.shape[-1] != 3:
                raise ValueError(
                    f"5D input must be (B,T,H,W,3) RGB; got "
                    f"shape {clip_u8.shape}")
            rgb_in, batched = True, True
        elif clip_u8.ndim == 4:
            if clip_u8.shape[-1] == 3:
                rgb_in, batched = True, False
            elif clip_u8.shape[-1] <= 4:
                raise ValueError(
                    f"4D input with trailing dim {clip_u8.shape[-1]} is "
                    f"neither RGB (C=3) nor batched I420 (B,T,H*3/2,W); "
                    f"got shape {clip_u8.shape}")
            else:
                rgb_in, batched = False, True  # batched I420
        else:
            raise ValueError(f"unsupported input shape {clip_u8.shape}")
        clips = list(clip_u8) if batched else [clip_u8]
        if self.wire != "rgb" and rgb_in:
            from ..data.video import rgb_to_yuv420

            w = self._wire_hw()
            if clips and clips[0].shape[1] != w:
                # Lowres wire: bring RGB input to the wire geometry first
                # (area downscale — the decode path's lowres loss analog).
                import cv2

                clips = [np.stack([cv2.resize(f, (w, w),
                                              interpolation=cv2.INTER_AREA)
                                   for f in c]) for c in clips]
            clips = [rgb_to_yuv420(np.ascontiguousarray(c)) for c in clips]
        probs = self._forward(self.state.params, self.state.batch_stats,
                              self._stack_payload(clips))
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

        # Batch mode decodes at the WIRE geometry, like the single-video
        # path: on a lowres wire the jitted forward was compiled for the
        # reduced (crop >> lowres) payload, so decoding at full crop here
        # would change the payload shape and kill the one-jit-shape contract.
        w = self._wire_hw()
        hw = (w, w)
        lowres = self.wire_lowres if self.wire != "rgb" else 0

        fmt = "rgb" if self.wire == "rgb" else "i420"

        def decode(plan):
            path, idx, total = plan
            try:
                return decode_frames_auto(path, idx, resize_to=hw, fmt=fmt,
                                          lowres=lowres)
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
                                       self._stack_payload(batch_clips)))
                                batch_plans, batch_clips = [], []
                    if batch_clips:
                        n_real = len(batch_clips)
                        while len(batch_clips) < batch_size:  # keep ONE jit shape
                            batch_clips.append(batch_clips[-1])
                        q.put((batch_plans[:n_real],
                               self._stack_payload(batch_clips)))
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
