"""Visualization suite smoke tests (PNG outputs exist and are non-empty)."""

from pathlib import Path

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from laryngeal_tpu.evals.metrics import compute_all_metrics
from laryngeal_tpu.utils.visualization import EnhancedVisualizer, TrainingVisualizer


@pytest.fixture
def viz(tmp_path):
    return TrainingVisualizer(tmp_path)


def _check(path):
    assert path is not None
    p = Path(path)
    assert p.exists() and p.stat().st_size > 1000


def test_enhanced_is_alias():
    assert EnhancedVisualizer is TrainingVisualizer


def test_plot_training_history(viz):
    hist = {
        "train_loss": [1.0, 0.8, 0.6], "val_loss": [1.1, 0.9, 0.95],
        "train_acc": [0.5, 0.6, 0.7], "val_acc": [0.5, 0.55, 0.6],
        "train_auroc": [0.5, 0.65, 0.75], "val_auroc": [0.5, 0.6, 0.58],
    }
    _check(viz.plot_training_history(hist))
    assert viz.plot_training_history({"train_loss": []}) is None


def test_plot_confusion_and_dashboards(viz):
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 2, 60)
    scores = np.clip(labels * 0.5 + rng.normal(0.25, 0.25, 60), 0, 1)
    probs = np.stack([1 - scores, scores], 1)
    preds = (scores > 0.5).astype(int)
    m = compute_all_metrics(labels, preds, probs)
    names = ["non_referral", "referral"]
    _check(viz.plot_confusion_matrix(m["confusion_matrix"], names))
    _check(viz.plot_roc_curve(m))
    _check(viz.plot_evaluation_metrics(m, names))


def test_plot_sample_predictions(viz):
    rng = np.random.default_rng(1)
    clips = rng.integers(0, 255, (5, 4, 32, 32, 3)).astype(np.uint8)
    labels = [0, 1, 0, 1, 1]
    preds = [0, 1, 1, 1, 0]
    probs = [0.9, 0.8, 0.6, 0.7, 0.55]
    _check(viz.plot_sample_predictions(clips, labels, preds, probs,
                                       ["non_referral", "referral"]))


def test_visualize_sampling(viz):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
    _check(viz.visualize_sampling("/x/video_07.mp4", [0, 10, 25, 40, 55, 70, 85, 99],
                                  100, "random_window", frames=frames))
