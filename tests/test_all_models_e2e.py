"""Capstone integration: every model family trains, checkpoints, evaluates,
and serves single-video inference through the same framework path."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.evals.evaluator import Evaluator
from laryngeal_tpu.infer.predictor import Predictor
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.train.trainer import Trainer

TINY = {
    "vivit": dict(hidden_size=32, num_layers=1, num_heads=2,
                  intermediate_size=64, image_size=64, num_frames=4),
    "timesformer": dict(hidden_size=32, num_layers=1, num_heads=2,
                        intermediate_size=64, image_size=64, num_frames=4,
                        patch_size=16),
    "swin3d": dict(),  # model_size-driven factory; config below
    "resnet3d": dict(),
    "resnet50_lstm": dict(hidden_size=32, num_layers=1, dropout=0.0),
}


def build_model(name):
    if name == "vivit":
        from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification

        return VivitForVideoClassification(VivitConfig(**TINY[name])), TINY[name]
    if name == "timesformer":
        from laryngeal_tpu.models.timesformer import (
            TimesformerConfig,
            TimesformerForVideoClassification,
        )

        return TimesformerForVideoClassification(TimesformerConfig(**TINY[name])), TINY[name]
    if name == "swin3d":
        from laryngeal_tpu.models.swin3d import Swin3DConfig, SwinTransformer3D

        kw = dict(embed_dim=8, depths=(1, 1), num_heads=(2, 2),
                  window=(2, 2, 2), patch_size=(2, 4, 4))
        return SwinTransformer3D(Swin3DConfig(**kw)), kw
    if name == "resnet3d":
        from laryngeal_tpu.models.resnet3d import ResNet3D, ResNet3DConfig

        kw = dict(stage_sizes=(1, 1, 1, 1))
        return ResNet3D(ResNet3DConfig(**kw)), kw
    if name == "resnet50_lstm":
        from laryngeal_tpu.models.resnet import ResNetLSTMConfig, VideoResNet50LSTM

        return VideoResNet50LSTM(ResNetLSTMConfig(**TINY[name])), TINY[name]
    raise ValueError(name)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e_all")
    make_synthetic_dataset(str(root), {"train": 2, "val": 2, "test": 2},
                           num_frames=10, h=64, w=64, seed=31)
    return root


@pytest.mark.parametrize("name", ["vivit", "timesformer", "swin3d",
                                  "resnet3d", "resnet50_lstm"])
def test_model_family_end_to_end(name, synth_root, tmp_path):
    spec = get_model_spec(name)
    model, model_kwargs = build_model(name)
    loaders = create_dataloaders(
        str(synth_root), num_frames=4, batch_size=4, resize_to=(64, 64),
        pad_last=True, label_policy=spec.label_policy,
        per_video_seed=spec.per_video_seed,
    )
    config = {"epochs": 1, "learning_rate": 1e-3, "crop_size": 64, "seed": 0,
              "use_early_stopping": False}
    trainer = Trainer(model, spec, loaders, config, exp_dir=tmp_path)
    state = trainer.train()
    assert np.isfinite(trainer.history["train_loss"][0])
    assert (tmp_path / "best_model").exists()

    ev = Evaluator(trainer.eval_step, loaders["test"],
                   class_names=loaders["test"].dataset.class_labels,
                   exp_dir=tmp_path)
    auroc, f1, cm = ev.evaluate(state)
    assert cm.sum() == len(loaders["test"].dataset)

    # Inference from the checkpoint via the production Predictor path
    # (swin/resnet3d tiny configs aren't registry presets, so pass kwargs).
    predictor = Predictor.from_checkpoint(
        name, tmp_path / "best_model", num_frames=4, crop_size=64,
        model_kwargs=model_kwargs,
    )
    video = next((synth_root / "test" / "referral").glob("*.mp4"))
    result = predictor.predict_video(str(video))
    assert result["predicted_class"] in ("referral", "non_referral")
    assert abs(sum(result["probabilities"].values()) - 1.0) < 1e-4
