"""Pins the device-side metric accumulation contract (VERDICT round-1 #5):
the trainer and evaluator must perform exactly ONE host fetch per epoch/pass,
not one per batch — per-batch fetches serialize compute with ~0.5 s relay
round-trips on the target rig."""

import jax
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.evals.evaluator import Evaluator
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("devmetrics")
    # 8 train videos / batch 2 -> 4 train batches per epoch.
    make_synthetic_dataset(
        str(root), {"train": 4, "val": 2, "test": 2}, num_frames=8, h=64, w=64, seed=9)
    return root


def tiny_vivit():
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4,
                      num_classes=2)
    return VivitForVideoClassification(cfg)


def test_one_device_get_per_epoch_pass(synth_root, tmp_path, monkeypatch):
    spec = get_model_spec("vivit")
    loaders = create_dataloaders(str(synth_root), num_frames=4, batch_size=2,
                                 resize_to=(64, 64), pad_last=True)
    model = tiny_vivit()
    trainer = Trainer(model, spec, loaders,
                      {"epochs": 1, "learning_rate": 1e-3, "crop_size": 64,
                       "seed": 42}, exp_dir=tmp_path)

    calls = {"n": 0}
    real_get = jax.device_get

    def counting_get(x):
        calls["n"] += 1
        return real_get(x)

    monkeypatch.setattr(jax, "device_get", counting_get)
    tr = trainer._run_epoch("train", train=True)
    assert calls["n"] == 1, "train epoch must fetch exactly once"
    assert np.isfinite(tr["loss"]) and 0.0 <= tr["acc"] <= 1.0

    calls["n"] = 0
    va = trainer._run_epoch("val", train=False)
    assert calls["n"] == 1, "val epoch must fetch exactly once"
    assert np.isfinite(va["loss"])

    calls["n"] = 0
    ev = Evaluator(trainer.eval_step, loaders["test"],
                   class_names=loaders["test"].dataset.class_labels)
    ev._run_pass(trainer.state)
    assert calls["n"] == 1, "eval pass must fetch exactly once"


def test_epoch_metrics_match_per_batch_reference(synth_root, tmp_path):
    """The fused epoch-end reduction must equal the old per-batch float()
    accumulation bit-for-bit (same float64 summation order)."""
    spec = get_model_spec("vivit")
    loaders = create_dataloaders(str(synth_root), num_frames=4, batch_size=2,
                                 resize_to=(64, 64), pad_last=True)
    model = tiny_vivit()
    trainer = Trainer(model, spec, loaders,
                      {"epochs": 1, "learning_rate": 1e-3, "crop_size": 64,
                       "seed": 42}, exp_dir=tmp_path)
    from laryngeal_tpu.train.steps import prepare_batch

    # Reference accumulation (round-1 behavior) on the eval step.
    losses, correct, count = [], 0.0, 0.0
    for batch in loaders["val"]:
        pixel, labels, mask = prepare_batch(batch, None)
        m = trainer.eval_step(trainer.state, pixel, labels, mask)
        losses.append(float(m["loss"]))
        correct += float(m["correct"])
        count += float(m["count"])
    ref_loss = float(np.mean(losses))
    ref_acc = correct / max(count, 1.0)

    got = trainer._run_epoch("val", train=False)
    assert got["loss"] == ref_loss
    assert got["acc"] == ref_acc
