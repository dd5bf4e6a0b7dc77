"""Clip-averaged evaluation + sampler salt tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
import jax
import jax.numpy as jnp

from laryngeal_tpu.data.pipeline import create_dataloaders
from laryngeal_tpu.data.samplers import FrameSampler
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.evals.evaluator import Evaluator
from laryngeal_tpu.models.registry import get_model_spec
from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
from laryngeal_tpu.train.state import create_train_state
from laryngeal_tpu.train.steps import make_eval_step


def test_sampler_salt_varies_per_video_draws():
    s = FrameSampler("random_window", num_frames=8, per_video_seed=True)
    a = s("v.mp4", 100)
    s.salt = 1
    b = s("v.mp4", 100)
    assert a != b
    s.salt = 0
    assert s("v.mp4", 100) == a  # cache per salt
    assert "v.mp4" in s.cached_indices


def test_clip_averaged_eval(tmp_path):
    make_synthetic_dataset(str(tmp_path / "d"), {"train": 1, "val": 1, "test": 3},
                           num_frames=16, h=64, w=64, seed=3)
    loaders = create_dataloaders(str(tmp_path / "d"),
                                 sampling_methods={"test": "random_window"},
                                 num_frames=4, batch_size=4, resize_to=(64, 64),
                                 pad_last=True)
    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4)
    model = VivitForVideoClassification(cfg)
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 64, 64, 3)),
                               optimizer="adamw", learning_rate=1e-3)
    spec = get_model_spec("vivit")
    eval_step = make_eval_step(model, spec.preprocess_regime, spec.loss, crop=64)
    ev = Evaluator(eval_step, loaders["test"], exp_dir=tmp_path)

    auroc1, f1_1, cm1 = ev.evaluate(state, eval_clips=1)
    auroc3, f1_3, cm3 = ev.evaluate(state, sampling_method="rw3", eval_clips=3)
    assert cm3.sum() == cm1.sum() == len(loaders["test"].dataset)
    # Sampler salt restored after multi-pass eval.
    assert loaders["test"].dataset.sampler.salt == 0

    # Uniform sampling: extra passes are identical, evaluator skips them.
    loaders_u = create_dataloaders(str(tmp_path / "d"), num_frames=4,
                                   batch_size=4, resize_to=(64, 64), pad_last=True)
    ev_u = Evaluator(eval_step, loaders_u["test"], exp_dir=tmp_path)
    a1, _, _ = ev_u.evaluate(state, sampling_method="u1", eval_clips=1)
    a5, _, _ = ev_u.evaluate(state, sampling_method="u5", eval_clips=5)
    assert a1 == pytest.approx(a5)
