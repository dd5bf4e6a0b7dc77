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


def test_predict_videos_matches_predict_video(tmp_path):
    """Batched serving path returns the same schema and (to decode-backend
    tolerance) the same probabilities as the per-video path."""
    import numpy as np
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset
    from laryngeal_tpu.infer.predictor import Predictor
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
    from laryngeal_tpu.train.state import create_train_state
    import jax
    import jax.numpy as jnp

    make_synthetic_dataset(str(tmp_path), {"test": 3}, num_frames=12, h=64, w=64, seed=2)
    videos = sorted((tmp_path / "test").rglob("*.mp4"))
    assert len(videos) == 6

    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4,
                      num_classes=2)
    model = VivitForVideoClassification(cfg)
    spec = get_model_spec("vivit")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 64, 64, 3)), optimizer="adamw",
                               learning_rate=1e-3)
    pred = Predictor(model, spec, state, num_frames=4, crop_size=64)

    singles = [pred.predict_video(str(v)) for v in videos]
    pred.sampler.reset()
    batched = pred.predict_videos([str(v) for v in videos], batch_size=4)

    assert len(batched) == len(singles)
    for s, b in zip(singles, batched):
        assert b["video_path"] == s["video_path"]
        assert b["frame_indices"] == s["frame_indices"]
        assert set(b) == set(s)
        # cv2 vs native-libav scaling may differ by a pixel LSB; probs agree
        # to a loose tolerance on an untrained model.
        for c in b["probabilities"]:
            assert abs(b["probabilities"][c] - s["probabilities"][c]) < 0.05


def test_predict_videos_skips_unreadable(tmp_path):
    import numpy as np
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset
    from laryngeal_tpu.infer.predictor import Predictor
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import VivitConfig, VivitForVideoClassification
    from laryngeal_tpu.train.state import create_train_state
    import jax
    import jax.numpy as jnp

    make_synthetic_dataset(str(tmp_path), {"test": 1}, num_frames=12, h=64, w=64, seed=3)
    videos = [str(v) for v in sorted((tmp_path / "test").rglob("*.mp4"))]
    bogus = tmp_path / "bogus.mp4"
    bogus.write_bytes(b"not a video")

    cfg = VivitConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=64, num_frames=4,
                      num_classes=2)
    model = VivitForVideoClassification(cfg)
    spec = get_model_spec("vivit")
    state = create_train_state(model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 4, 64, 64, 3)), optimizer="adamw",
                               learning_rate=1e-3)
    pred = Predictor(model, spec, state, num_frames=4, crop_size=64)
    results = pred.predict_videos(videos + [str(bogus)], batch_size=4)
    assert len(results) == len(videos)
