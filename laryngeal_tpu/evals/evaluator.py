"""Evaluator — test-set metrics + JSON/plot outputs.

Parity: ``vivit_transformer/vivit_classifier/evaluators/evaluator.py:122-255``
(returns ``(auroc, f1, confusion_matrix)``, writes
``test_metrics_{sampling}.json``, renders CM/ROC/dashboard plots).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..train.steps import prepare_batch
from . import metrics as M


def _jsonable(obj):
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    return obj


class Evaluator:
    def __init__(
        self,
        eval_step,
        loader,
        class_names: Sequence[str] = ("non_referral", "referral"),
        logger=None,
        exp_dir=None,
        visualizer=None,
        mesh=None,
    ):
        import logging

        self.eval_step = eval_step
        self.loader = loader
        self.class_names = list(class_names)
        self.logger = logger or logging.getLogger(__name__)
        self.exp_dir = Path(exp_dir) if exp_dir else None
        self.visualizer = visualizer
        self.mesh = mesh

    def _run_pass(self, state):
        """Single pass over the test loader; per-batch outputs stay on device
        and are fetched in one device_get at the end (see Trainer._run_epoch
        for why per-batch fetches are poison on the axon relay)."""
        import jax
        import jax.numpy as jnp

        mp = jax.process_count() > 1
        if mp:
            from ..parallel.distributed import fetch_replicated

        probs_dev, loss_dev, masks, labels_all, paths = [], [], [], [], []
        indices_of = {}
        for batch in self.loader:
            pixel, labels, mask = prepare_batch(batch, self.mesh)
            m = self.eval_step(state, pixel, labels, mask)
            if mp:
                m = fetch_replicated(m)
            probs_dev.append(m["probs"])
            loss_dev.append(m["loss"])
            # Multi-process feed: metrics run over the GLOBAL batch; the
            # list fields (paths/indices) exist only for this process's rows
            # [lo, hi) — other rows get "" (plots are best-effort, rank 0).
            valid = np.asarray(batch.get("mask_global", batch["mask"]))
            masks.append(valid)
            labels_all.append(
                np.asarray(batch.get("labels_global", batch["labels"]))[valid])
            local_paths = list(batch["video_paths"])
            local_fi = list(batch.get("frame_indices", []))
            lo, hi = batch.get("local_rows", (0, len(local_paths)))
            full_paths = [""] * len(valid)
            full_paths[lo:hi] = local_paths
            full_fi = [None] * len(valid)
            full_fi[lo:hi] = local_fi
            vpaths = [p for p, ok in zip(full_paths, valid) if ok]
            paths.extend(vpaths)
            # Retain the sampled indices the prediction actually consumed —
            # the plot path must not re-draw stream-seeded samplers
            # (dataset.rgb_clip docstring).
            for p, fi in zip(vpaths,
                             [f for f, ok in zip(full_fi, valid) if ok]):
                if p and fi is not None:
                    indices_of[p] = fi
        self._last_frame_indices = indices_of
        if not probs_dev:
            return np.zeros((0, 2)), np.zeros((0,), int), [], []
        if mp:
            probs = np.concatenate(probs_dev, axis=0)
            losses = np.asarray(loss_dev, dtype=np.float64)
        else:
            probs, losses = jax.device_get(
                (jnp.concatenate(probs_dev, axis=0), jnp.stack(loss_dev)))
        valid = np.concatenate(masks)
        probs = np.asarray(probs)[valid]
        labels = np.concatenate(labels_all)
        return probs, labels, paths, [float(x) for x in losses]

    def evaluate(self, state, sampling_method: str = "uniform",
                 eval_clips: int = 1) -> Tuple[float, float, np.ndarray]:
        """eval_clips > 1 averages per-video probabilities over multiple
        sampled clips (clip-averaged eval, the resnet3d evaluator's
        prediction-mean over the clips axis,
        resnet50-3d-video/.../evaluators/evaluator.py:289-302). Stochastic
        samplers draw a fresh clip per pass; deterministic 'uniform' sampling
        makes extra passes identical, so they are skipped."""
        sampler = getattr(self.loader.dataset, "sampler", None)
        passes = 1
        if eval_clips > 1 and sampler is not None and sampler.method != "uniform":
            passes = int(eval_clips)

        probs_sum = None
        labels = paths = None
        losses = []
        for p in range(passes):
            if passes > 1:
                # Fresh clips per pass: deterministic per-pass resample
                # (FrameSampler.resample salts seeds / reseeds the stream)
                # plus invalidation of clips cached under the old indices.
                self.loader.dataset.resample_clips(p)
            probs, labels, paths, pass_losses = self._run_pass(state)
            losses.extend(pass_losses)
            probs_sum = probs if probs_sum is None else probs_sum + probs
        if passes > 1:
            self.loader.dataset.resample_clips(0)
        probs = probs_sum / passes if probs_sum is not None else np.zeros((0, 2))
        preds = probs.argmax(axis=-1) if probs.size else np.zeros((0,), int)

        metrics = M.compute_all_metrics(labels, preds, probs, self.class_names)
        metrics["test_loss"] = float(np.mean(losses)) if losses else 0.0

        for k in ("accuracy", "f1_score", "precision", "recall", "auroc"):
            self.logger.info("%s: %.4f", k, metrics.get(k, 0.0))

        if self.exp_dir is not None:
            out = self.exp_dir / f"test_metrics_{sampling_method}.json"
            payload = {k: _jsonable(v) for k, v in metrics.items()}
            payload["per_video"] = [
                {"video_path": p, "label": int(l), "pred": int(pr),
                 "prob_referral": float(pb[1])}
                for p, l, pr, pb in zip(paths, labels, preds, probs)
            ]
            with open(out, "w") as f:
                json.dump(payload, f, indent=4)
            self.logger.info("Saved test metrics to %s", out)

        if self.visualizer is not None:
            try:
                self.visualizer.plot_confusion_matrix(
                    metrics.get("confusion_matrix", np.zeros((2, 2))), self.class_names
                )
                if "roc_curve" in metrics:
                    self.visualizer.plot_roc_curve(metrics)
                self.visualizer.plot_evaluation_metrics(metrics, self.class_names)
                # Sample-prediction frame grid from the test loader — the
                # reference evaluator renders this per run
                # (vivit_transformer/.../evaluators/evaluator.py:214-249).
                self._plot_sample_predictions(paths, labels, preds, probs)
            except Exception as e:
                self.logger.warning("Evaluation plots failed: %s", e)

        return (
            metrics.get("auroc", 0.0),
            metrics.get("f1_score", 0.0),
            metrics.get("confusion_matrix", np.array([])),
        )

    def _plot_sample_predictions(self, paths, labels, preds, probs,
                                 max_samples: int = 8) -> None:
        """Middle-frame grid of the first ``max_samples`` test videos with
        green/red correctness titles (reference evaluator.py:214-249)."""
        if not len(paths):
            return
        by_path = {p: i for i, p in enumerate(paths)}
        ds = self.loader.dataset
        clips, ls, ps, pr = [], [], [], []
        for i in range(len(ds)):
            if len(clips) >= max_samples:
                break
            path = ds.video_paths[i]
            j = by_path.get(path)
            if j is None:
                continue
            # RGB regardless of the dataset's wire format (plots need
            # displayable frames; the feed may ship i420/dct payloads).
            # Pass the indices the prediction consumed: rgb_clip(i) without
            # them would re-draw stream-seeded samplers — plotting different
            # frames AND advancing the shared sampler RNG (non-reproducible
            # later evals in the same process).
            fi = getattr(self, "_last_frame_indices", {}).get(path)
            clips.append(ds.rgb_clip(i, indices=fi) if hasattr(ds, "rgb_clip")
                         else ds[i]["pixel_values"])
            ls.append(int(labels[j]))
            ps.append(int(preds[j]))
            pr.append(float(probs[j, ps[-1]]))
        if clips:
            self.visualizer.plot_sample_predictions(
                clips, ls, ps, pr, self.class_names, max_samples=max_samples)
