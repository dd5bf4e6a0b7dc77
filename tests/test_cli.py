"""CLI end-to-end: train via the reference flag surface, then infer."""

import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.cli import inference as inference_cli
from laryngeal_tpu.cli import main as train_cli
from laryngeal_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_synth")
    make_synthetic_dataset(
        str(root), {"train": 3, "val": 2, "test": 2}, num_frames=10, h=64, w=64, seed=9
    )
    return root


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("cli_logs")
    result = train_cli.main([
        "--model", "vivit",
        "--data_dir", str(synth_root),
        "--log_dir", str(out),
        "--train_sampling", "random_window",
        "--val_sampling", "uniform",
        "--test_sampling", "uniform",
        "--num_frames", "4",
        "--batch_size", "4",
        "--epochs", "1",
        "--learning_rate", "0.001",
        "--patience", "7",
        "--crop_size", "64",
        "--seed", "42",
    ])
    return result


def test_train_cli_outputs(trained):
    exp_dir = Path(trained["exp_dir"])
    assert 0.0 <= trained["auroc"] <= 1.0
    assert (exp_dir / "training_config.json").exists()
    assert (exp_dir / "training_history.json").exists()
    assert (exp_dir / "best_model").exists()
    assert (exp_dir / "test_metrics_uniform.json").exists()
    cfg = json.loads((exp_dir / "training_config.json").read_text())
    assert cfg["model"] == "vivit"
    assert cfg["num_frames"] == 4


def test_inference_cli_single_video(trained, synth_root, tmp_path):
    video = next((synth_root / "test" / "referral").glob("*.mp4"))
    result = inference_cli.main([
        "--model", "vivit",
        "--video_path", str(video),
        "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
        "--log_dir", str(tmp_path),
        "--num_frames", "4",
        "--sampling_method", "uniform",
        "--crop_size", "64",
    ])
    assert result["predicted_class"] in ("referral", "non_referral")
    assert 0.0 <= result["confidence"] <= 1.0
    assert set(result["probabilities"]) == {"referral", "non_referral"}
    assert abs(sum(result["probabilities"].values()) - 1.0) < 1e-5
    # JSON written under inference_results/.
    out = list(tmp_path.glob("**/inference_results/*_result.json"))
    assert len(out) == 1


def test_inference_cli_batch_mode(trained, synth_root, tmp_path):
    results = inference_cli.main([
        "--model", "vivit",
        "--video_dir", str(synth_root / "test"),
        "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
        "--log_dir", str(tmp_path),
        "--num_frames", "4",
        "--crop_size", "64",
    ])
    assert len(results) == 4
    csvs = list(tmp_path.glob("**/inference_results/batch_results.csv"))
    assert len(csvs) == 1
    lines = csvs[0].read_text().strip().splitlines()
    assert len(lines) == 5  # header + 4 rows
    # Inference-side sampled-frames audit
    # (resnet50-3d-video/inference.py:206-245).
    audits = list(tmp_path.glob(
        "**/inference_results/inference_sampled_frames_uniform.csv"))
    assert len(audits) == 1
    import csv as csv_mod

    with open(audits[0]) as f:
        rows = list(csv_mod.reader(f))
    assert rows[0] == ["video_filename", "total_frames", "sampled_frames",
                       "dynamic_fps"]
    assert len(rows) == 5
    for fname, total, sampled, _fps in rows[1:]:
        assert fname.endswith(".mp4") and int(total) > 0
        assert len(sampled.split(",")) == 4  # num_frames indices


def test_cli_requires_video_arg(trained, tmp_path):
    with pytest.raises(SystemExit):
        inference_cli.main([
            "--model", "vivit",
            "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
            "--log_dir", str(tmp_path),
        ])


def test_test_dir_alias(synth_root, tmp_path):
    """--test_dir (2d-lstm spelling) aliases --test_data_dir (vivit spelling)."""
    parser = train_cli.build_parser()
    a = parser.parse_args(["--model", "vivit", "--data_dir", "d", "--test_dir", "x"])
    b = parser.parse_args(["--model", "vivit", "--data_dir", "d", "--test_data_dir", "x"])
    assert a.test_data_dir == b.test_data_dir == "x"
    # --sequence_length (2d-lstm) aliases --num_frames.
    c = parser.parse_args(["--model", "resnet50_lstm", "--data_dir", "d",
                           "--sequence_length", "16"])
    assert c.num_frames == 16


def test_remat_flag(synth_root, tmp_path):
    """--remat trains through jax.checkpoint'd blocks and pins the choice
    in checkpoint metadata; CNN families reject it."""
    result = train_cli.main([
        "--model", "vivit", "--data_dir", str(synth_root),
        "--log_dir", str(tmp_path), "--num_frames", "4", "--batch_size", "4",
        "--epochs", "1", "--crop_size", "64", "--seed", "42", "--remat",
    ])
    assert 0.0 <= result["auroc"] <= 1.0
    cfg = json.loads((Path(result["exp_dir"]) / "training_config.json").read_text())
    assert cfg["model_kwargs"]["remat"] is True

    with pytest.raises(SystemExit):
        train_cli.main([
            "--model", "resnet3d", "--data_dir", str(synth_root),
            "--log_dir", str(tmp_path), "--epochs", "1", "--remat",
        ])
    # Rejected flag combos must not leave empty experiment dirs behind.
    assert not [d for d in tmp_path.iterdir()
                if d.is_dir() and d.name.startswith("resnet3d")]


def test_remat_swin3d_grad():
    """swin3d remat traces (DropPath branches on the static train arg) and
    differentiates — regression for the kwarg-traced-train crash."""
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.swin3d import create_swin3d

    m = create_swin3d("tiny", num_classes=2, remat=True)
    x = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    g = jax.grad(lambda p: m.apply({"params": p}, x, train=False).sum())(
        v["params"])
    assert jax.tree_util.tree_structure(g) == jax.tree_util.tree_structure(
        v["params"])
