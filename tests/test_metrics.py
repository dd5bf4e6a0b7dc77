"""Parity tests: pure-numpy metrics vs sklearn (test-only dependency)."""

import numpy as np
import pytest

sk = pytest.importorskip("sklearn.metrics")

from laryngeal_tpu.evals import metrics as M


def make_binary(n=200, seed=0, flip=0.3):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    scores = np.clip(y + rng.normal(0, 0.8, n), 0, 1)
    # add ties
    scores = np.round(scores, 2)
    preds = (scores >= 0.5).astype(int)
    return y, preds, scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_binary_scalar_metrics_match_sklearn(seed):
    y, preds, scores = make_binary(seed=seed)
    assert M.accuracy_score(y, preds) == pytest.approx(sk.accuracy_score(y, preds))
    p, r, f1 = M.precision_recall_f1(y, preds, average="binary")
    assert p == pytest.approx(sk.precision_score(y, preds, zero_division=0))
    assert r == pytest.approx(sk.recall_score(y, preds, zero_division=0))
    assert f1 == pytest.approx(sk.f1_score(y, preds, zero_division=0))
    assert M.roc_auc_score(y, scores) == pytest.approx(sk.roc_auc_score(y, scores), abs=1e-12)
    assert M.average_precision_score(y, scores) == pytest.approx(
        sk.average_precision_score(y, scores), abs=1e-12)
    np.testing.assert_array_equal(M.confusion_matrix(y, preds), sk.confusion_matrix(y, preds))


def test_roc_curve_matches_sklearn_without_drop():
    y, _, scores = make_binary(seed=5)
    fpr, tpr, thr = M.roc_curve(y, scores)
    sk_fpr, sk_tpr, sk_thr = sk.roc_curve(y, scores, drop_intermediate=False)
    np.testing.assert_allclose(fpr, sk_fpr)
    np.testing.assert_allclose(tpr, sk_tpr)
    np.testing.assert_allclose(thr, sk_thr)


def test_pr_curve_matches_sklearn():
    y, _, scores = make_binary(seed=6)
    prec, rec, thr = M.precision_recall_curve(y, scores)
    sp, sr, st = sk.precision_recall_curve(y, scores)
    np.testing.assert_allclose(prec, sp)
    np.testing.assert_allclose(rec, sr)
    np.testing.assert_allclose(thr, st)


def test_optimal_threshold_matches_reference_rule():
    y, _, scores = make_binary(seed=7)
    fpr, tpr, thr = sk.roc_curve(y, scores, drop_intermediate=False)
    expected = float(thr[np.argmax(tpr - fpr)])
    assert M.optimal_roc_threshold(y, scores) == pytest.approx(expected)


def test_best_f1_threshold_matches_reference_loop():
    y, _, scores = make_binary(seed=8)
    precision, recall, pr_thresholds = sk.precision_recall_curve(y, scores)
    f1s = []
    for i in range(len(precision) - 1):
        if precision[i] + recall[i] > 0:
            f1s.append(2 * precision[i] * recall[i] / (precision[i] + recall[i]))
        else:
            f1s.append(0)
    expected = float(pr_thresholds[int(np.argmax(f1s))])
    assert M.best_f1_threshold(y, scores) == pytest.approx(expected)


def test_weighted_multiclass_matches_sklearn():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 3, 150)
    preds = rng.integers(0, 3, 150)
    p, r, f1 = M.precision_recall_f1(y, preds, average="weighted")
    assert p == pytest.approx(sk.precision_score(y, preds, average="weighted", zero_division=0))
    assert r == pytest.approx(sk.recall_score(y, preds, average="weighted", zero_division=0))
    assert f1 == pytest.approx(sk.f1_score(y, preds, average="weighted"))


def test_specificity_npv():
    cm = np.array([[50, 10], [5, 35]])
    spec, npv = M.specificity_npv(cm)
    assert spec == pytest.approx(50 / 60)
    assert npv == pytest.approx(50 / 55)


def test_compute_all_metrics_schema_binary():
    y, preds, scores = make_binary(seed=9)
    probs = np.stack([1 - scores, scores], axis=1)
    m = M.compute_all_metrics(y, preds, probs)
    for key in ("accuracy", "f1_score", "precision", "recall", "auroc",
                "confusion_matrix", "roc_curve", "pr_curve", "optimal_threshold",
                "average_precision", "specificity", "npv"):
        assert key in m, key
    assert m["auroc"] == pytest.approx(sk.roc_auc_score(y, scores))


def test_compute_all_metrics_degenerate():
    m = M.compute_all_metrics([], [], np.zeros((0, 2)))
    assert m["accuracy"] == 0.0 and m["auroc"] == 0.0
    # Single-class labels: AUROC degrades to 0.0 (reference contract).
    y = np.ones(10, dtype=int)
    probs = np.tile([0.3, 0.7], (10, 1))
    m = M.compute_all_metrics(y, y, probs)
    assert m["auroc"] == 0.0


def test_auroc_with_heavy_ties():
    y = np.array([0, 0, 1, 1, 0, 1, 1, 0])
    s = np.array([0.5, 0.5, 0.5, 0.5, 0.2, 0.9, 0.9, 0.1])
    assert M.roc_auc_score(y, s) == pytest.approx(sk.roc_auc_score(y, s))
