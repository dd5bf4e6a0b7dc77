"""End-to-end learning test: the full pipeline actually separates classes.

Synthetic referral videos contain a bright moving disk; a tiny ViViT trained
through the real Trainer for a few epochs must reach high train AUROC —
this catches silent breakage anywhere in decode -> preprocess -> model ->
loss -> optimizer that unit parity tests might miss in combination.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.trainer import Trainer


def test_tiny_vivit_learns_synthetic_signal(tmp_path):
    make_synthetic_dataset(
        str(tmp_path / "d"), {"train": 6, "val": 2, "test": 2},
        num_frames=12, h=64, w=64, seed=21, varied_lengths=False,
    )
    loaders = create_dataloaders(
        str(tmp_path / "d"), num_frames=4, batch_size=2,
        resize_to=(64, 64), pad_last=True,
    )
    cfg = VivitConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4)
    model = VivitForVideoClassification(cfg)
    spec = get_model_spec("vivit")
    config = {"epochs": 10, "learning_rate": 1e-3, "crop_size": 64,
              "seed": 0, "use_early_stopping": False}
    trainer = Trainer(model, spec, loaders, config, exp_dir=tmp_path / "run")
    trainer.train()

    # The signal is blatant (bright disk); the pipeline must learn it.
    assert max(trainer.history["train_auroc"]) >= 0.9, trainer.history["train_auroc"]
    assert trainer.history["train_loss"][-1] < trainer.history["train_loss"][0]
