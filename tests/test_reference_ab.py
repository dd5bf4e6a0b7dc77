"""Whole-loop A/B vs the ACTUAL reference pipelines (round-2 VERDICT #1).

Runs the unmodified reference ``vivit_transformer/main.py`` /
``timesformer/main.py`` (torch CPU subprocess, pytorchvideo stubbed onto its
own cv2 fallback) and ``laryngeal_tpu.cli.main`` from identical tiny HF
weights on the same seeded synthetic dataset, then pins: per-epoch train/val
losses track within fp+resample tolerance, the same best epoch is selected,
and the final test metrics/confusion matrix agree. See
``scripts/reference_ab.py`` and the committed ``AB_REPORT.md``.
"""

import shutil
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
cv2 = pytest.importorskip("cv2")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))

import reference_ab as AB  # noqa: E402

pytestmark = pytest.mark.skipif(
    not AB.REFERENCE.exists(), reason="reference checkout not available")


# resnet3d is the CNN-family whole-loop A/B: the unmodified
# resnet50-3d-video/main.py trains a full slow-R50 on torch CPU (stubs
# provide the real pytorchvideo contracts — see the script's docstring for
# the disclosed deterministic-RNG controls), so it runs 2 epochs, not 3,
# to bound suite time. The lstm (eval-mode) and swin3d (inference) A/Bs
# stay script-only (AB_REPORT.md); their training dynamics are pinned
# step-level in test_lstm_train_parity.py / test_swin3d_train_parity.py.
_EPOCHS = {"vivit": 3, "timesformer": 3, "resnet3d": 2}


@pytest.fixture(scope="module", params=["vivit", "timesformer", "resnet3d"])
def ab_result(request, tmp_path_factory):
    variant = request.param
    workdir = tmp_path_factory.mktemp(f"ab_{variant}")
    try:
        yield variant, AB.run_ab(variant, workdir, epochs=_EPOCHS[variant])
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def test_losses_track_reference(ab_result):
    variant, cmp_ = ab_result
    assert cmp_["epochs"] >= 1
    # ViViT's 256->224 resample differs PIL-vs-jax at the ~1e-2 pixel level;
    # the timesformer regime (224->224) is an exact affine. Measured vivit
    # delta: 5e-5 (AB_REPORT.md) — 0.02 is generous headroom, and far below
    # any behavioral divergence (a missed batch, wrong loss weighting, or a
    # different preprocess regime all blow past it immediately).
    assert cmp_["train_loss_max_abs_delta"] is not None
    assert cmp_["train_loss_max_abs_delta"] < 0.02, cmp_
    assert cmp_["val_loss_max_abs_delta"] < 0.02, cmp_
    assert cmp_["train_acc_max_abs_delta"] == 0.0, cmp_
    assert cmp_["val_acc_max_abs_delta"] == 0.0, cmp_


def test_selection_matches_reference(ab_result):
    variant, cmp_ = ab_result
    assert cmp_["best_epoch_match"], cmp_


def test_final_metrics_match_reference(ab_result):
    variant, cmp_ = ab_result
    # Predictions are discrete — near-tie logits may flip under the resample
    # tolerance; allow at most one of eight test videos.
    assert cmp_["pred_flips"] is not None and cmp_["pred_flips"] <= 1, cmp_
    assert abs(cmp_["test_accuracy_ref"] - cmp_["test_accuracy_ours"]) \
        <= 1 / 8 + 1e-9, cmp_
    assert abs(cmp_["test_auroc_ref"] - cmp_["test_auroc_ours"]) <= 0.2, cmp_
