"""Visualization suite — training curves, CM, ROC/PR dashboards, sampling.

Parity surface: ``vivit_transformer/vivit_classifier/utils/visualization.py``
(TrainingVisualizer, 9-607) and the 2d-lstm EnhancedVisualizer
(``resnet50-2d-lstm/src/utils/visualization.py:10-422``): training history
with best-epoch markers, confusion-matrix heatmap with percentages, ROC curve
with optimal-threshold annotation, a 2x2 evaluation dashboard (ROC / PR /
CM / metrics table), sample-prediction frame grids with green/red titles, and
frame-sampling timelines.

matplotlib/seaborn are import-gated: without them every method becomes a
no-op returning None, so headless training never breaks on plotting.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import numpy as np

try:  # pragma: no cover
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAS_MPL = True
except Exception:  # pragma: no cover
    plt = None
    HAS_MPL = False

try:  # pragma: no cover
    import seaborn as sns

    HAS_SNS = True
except Exception:  # pragma: no cover
    sns = None
    HAS_SNS = False


class TrainingVisualizer:
    """All plots write PNGs under ``viz_dir``; every method returns the path."""

    def __init__(self, viz_dir):
        self.viz_dir = Path(viz_dir)
        self.viz_dir.mkdir(parents=True, exist_ok=True)

    def _save(self, fig, name: str) -> Optional[str]:
        path = self.viz_dir / name
        fig.tight_layout()
        fig.savefig(path, dpi=100)
        plt.close(fig)
        return str(path)

    def plot_training_history(self, history: Dict) -> Optional[str]:
        if not HAS_MPL or not history.get("train_loss"):
            return None
        has_auroc = bool(history.get("val_auroc"))
        rows = 3 if has_auroc else 2
        fig, axes = plt.subplots(rows, 1, figsize=(10, 4 * rows))
        epochs = np.arange(1, len(history["train_loss"]) + 1)

        ax = axes[0]
        ax.plot(epochs, history["train_loss"], "b-", label="train loss")
        ax.plot(epochs, history["val_loss"], "r-", label="val loss")
        best = int(np.argmin(history["val_loss"]))
        ax.axvline(best + 1, color="g", linestyle="--", alpha=0.5,
                   label=f"best val loss (epoch {best + 1})")
        ax.set_xlabel("epoch"); ax.set_ylabel("loss"); ax.legend(); ax.grid(alpha=0.3)
        ax.set_title("Training and Validation Loss")

        ax = axes[1]
        ax.plot(epochs, history["train_acc"], "b-", label="train acc")
        ax.plot(epochs, history["val_acc"], "r-", label="val acc")
        ax.set_xlabel("epoch"); ax.set_ylabel("accuracy"); ax.legend(); ax.grid(alpha=0.3)
        ax.set_title("Training and Validation Accuracy")

        if has_auroc:
            ax = axes[2]
            ax.plot(epochs, history["train_auroc"], "b-", label="train AUROC")
            ax.plot(epochs, history["val_auroc"], "r-", label="val AUROC")
            best_a = int(np.argmax(history["val_auroc"]))
            ax.axvline(best_a + 1, color="g", linestyle="--", alpha=0.5,
                       label=f"best val AUROC (epoch {best_a + 1})")
            ax.set_xlabel("epoch"); ax.set_ylabel("AUROC"); ax.legend(); ax.grid(alpha=0.3)
            ax.set_title("Training and Validation AUROC")
        return self._save(fig, "training_history.png")

    def plot_confusion_matrix(self, cm, class_names: Sequence[str]) -> Optional[str]:
        if not HAS_MPL:
            return None
        cm = np.asarray(cm)
        if cm.size == 0:
            return None
        fig, ax = plt.subplots(figsize=(7, 6))
        total = cm.sum()
        annot = np.empty(cm.shape, dtype=object)
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                pct = 100.0 * cm[i, j] / total if total else 0.0
                annot[i, j] = f"{cm[i, j]}\n({pct:.1f}%)"
        if HAS_SNS:
            sns.heatmap(cm, annot=annot, fmt="", cmap="Blues",
                        xticklabels=class_names, yticklabels=class_names, ax=ax)
        else:
            ax.imshow(cm, cmap="Blues")
            for i in range(cm.shape[0]):
                for j in range(cm.shape[1]):
                    ax.text(j, i, annot[i, j], ha="center", va="center")
            ax.set_xticks(range(len(class_names)), class_names)
            ax.set_yticks(range(len(class_names)), class_names)
        ax.set_xlabel("Predicted"); ax.set_ylabel("True")
        ax.set_title("Confusion Matrix")
        return self._save(fig, "confusion_matrix.png")

    def plot_roc_curve(self, metrics: Dict) -> Optional[str]:
        if not HAS_MPL or "roc_curve" not in metrics:
            return None
        rc = metrics["roc_curve"]
        fpr, tpr = np.asarray(rc["fpr"]), np.asarray(rc["tpr"])
        thr = np.asarray(rc["thresholds"])
        fig, ax = plt.subplots(figsize=(8, 7))
        ax.plot(fpr, tpr, "b-", lw=2,
                label=f"ROC (AUROC = {metrics.get('auroc', 0.0):.3f})")
        ax.plot([0, 1], [0, 1], "k--", alpha=0.5)
        if thr.size:
            opt = int(np.argmax(tpr - fpr))
            ax.plot(fpr[opt], tpr[opt], "ro", ms=9,
                    label=f"optimal threshold = {metrics.get('optimal_threshold', 0):.3f}")
            # Annotate a few thresholds like the reference.
            for k in np.linspace(1, len(thr) - 1, min(5, len(thr) - 1), dtype=int):
                ax.annotate(f"{thr[k]:.2f}", (fpr[k], tpr[k]), fontsize=7, alpha=0.7)
        ax.set_xlabel("False Positive Rate"); ax.set_ylabel("True Positive Rate")
        ax.set_title("ROC Curve"); ax.legend(loc="lower right"); ax.grid(alpha=0.3)
        return self._save(fig, "roc_curve.png")

    def plot_evaluation_metrics(self, metrics: Dict,
                                class_names: Sequence[str]) -> Optional[str]:
        if not HAS_MPL:
            return None
        fig, axes = plt.subplots(2, 2, figsize=(14, 12))

        # ROC.
        ax = axes[0, 0]
        if "roc_curve" in metrics:
            rc = metrics["roc_curve"]
            ax.plot(rc["fpr"], rc["tpr"], "b-",
                    label=f"AUROC={metrics.get('auroc', 0):.3f}")
            ax.plot([0, 1], [0, 1], "k--", alpha=0.4)
            ax.legend(loc="lower right")
        ax.set_title("ROC"); ax.grid(alpha=0.3)

        # PR.
        ax = axes[0, 1]
        if "pr_curve" in metrics:
            pc = metrics["pr_curve"]
            ax.plot(pc["recall"], pc["precision"], "g-",
                    label=f"AP={metrics.get('average_precision', 0):.3f}")
            ax.legend(loc="lower left")
        ax.set_title("Precision-Recall"); ax.grid(alpha=0.3)
        ax.set_xlabel("recall"); ax.set_ylabel("precision")

        # CM.
        ax = axes[1, 0]
        cm = np.asarray(metrics.get("confusion_matrix", np.zeros((2, 2))))
        if cm.size:
            ax.imshow(cm, cmap="Blues")
            for i in range(cm.shape[0]):
                for j in range(cm.shape[1]):
                    ax.text(j, i, str(cm[i, j]), ha="center", va="center")
            ax.set_xticks(range(len(class_names)), class_names)
            ax.set_yticks(range(len(class_names)), class_names)
        ax.set_title("Confusion Matrix")

        # Metrics table.
        ax = axes[1, 1]
        ax.axis("off")
        rows = [(k, f"{metrics[k]:.4f}") for k in
                ("accuracy", "precision", "recall", "f1_score", "auroc",
                 "specificity", "npv", "average_precision") if k in metrics]
        if rows:
            table = ax.table(cellText=rows, colLabels=["metric", "value"],
                             loc="center", cellLoc="left")
            table.scale(1, 1.6)
        ax.set_title("Metrics")
        return self._save(fig, "evaluation_metrics.png")

    def plot_sample_predictions(self, clips, labels, preds, probs,
                                class_names: Sequence[str],
                                max_samples: int = 8) -> Optional[str]:
        """Middle frame per clip, green/red title by correctness
        (reference visualization.py plot_sample_predictions)."""
        if not HAS_MPL or len(clips) == 0:
            return None
        n = min(len(clips), max_samples)
        cols = min(4, n)
        rows = (n + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows), squeeze=False)
        for i in range(rows * cols):
            ax = axes[i // cols][i % cols]
            ax.axis("off")
            if i >= n:
                continue
            clip = np.asarray(clips[i])
            frame = clip[len(clip) // 2]
            ax.imshow(frame.astype(np.uint8))
            ok = int(preds[i]) == int(labels[i])
            ax.set_title(
                f"true: {class_names[int(labels[i])]}\n"
                f"pred: {class_names[int(preds[i])]} ({float(probs[i]):.2f})",
                color="green" if ok else "red", fontsize=9,
            )
        return self._save(fig, "sample_predictions.png")

    def visualize_sampling(self, video_path, indices, total_frames: int,
                           sampling_method: str, frames=None,
                           num_show: int = 8) -> Optional[str]:
        """Timeline of sampled indices + frame grid with timestamps
        (reference visualization.py:464-607)."""
        if not HAS_MPL:
            return None
        indices = list(indices)
        fig = plt.figure(figsize=(14, 6))

        ax = fig.add_subplot(2, 1, 1)
        ax.vlines(indices, 0, 1, colors="r", lw=1.5, label="sampled")
        ax.set_xlim(0, max(total_frames - 1, 1))
        ax.set_yticks([])
        ax.set_xlabel("frame index")
        ax.set_title(
            f"{Path(str(video_path)).name} — {sampling_method} sampling "
            f"({len(indices)} of {total_frames} frames)")
        if sampling_method == "random_window":
            w = total_frames / len(indices)
            for i in range(len(indices)):
                ax.axvspan(i * w, (i + 1) * w,
                           alpha=0.12 if i % 2 == 0 else 0.05, color="b")
        ax.legend(loc="upper right")

        if frames is not None and len(frames):
            show = np.linspace(0, len(frames) - 1, min(num_show, len(frames)), dtype=int)
            for j, fi in enumerate(show):
                ax = fig.add_subplot(2, len(show), len(show) + j + 1)
                ax.imshow(np.asarray(frames[fi]).astype(np.uint8))
                ax.axis("off")
                ax.set_title(f"idx {indices[fi]}", fontsize=8)
        name = f"sampling_{Path(str(video_path)).stem}_{sampling_method}.png"
        return self._save(fig, name)


# The 2d-lstm pipeline calls it EnhancedVisualizer; same implementation here.
EnhancedVisualizer = TrainingVisualizer
