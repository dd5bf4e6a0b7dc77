"""AOT export artifacts: roundtrip parity, batch routing, CLI surface.

The artifact must reproduce the checkpoint-backed Predictor's probabilities
exactly (same graph, weights baked as constants) and serve through the
inference CLI with no model code/checkpoint access.
"""

import json
import zipfile
from pathlib import Path

import numpy as np
import pytest

from laryngeal_tpu.cli import export as export_cli
from laryngeal_tpu.cli import inference as inference_cli
from laryngeal_tpu.cli import main as train_cli
from laryngeal_tpu.data.synthetic import make_synthetic_dataset
from laryngeal_tpu.infer.export import ExportedModel, ExportedPredictor
from laryngeal_tpu.infer.predictor import Predictor


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("export_synth")
    make_synthetic_dataset(
        str(root), {"train": 3, "val": 2, "test": 2}, num_frames=10, h=64, w=64,
        seed=5)
    return root


@pytest.fixture(scope="module")
def trained(synth_root, tmp_path_factory):
    out = tmp_path_factory.mktemp("export_logs")
    return train_cli.main([
        "--model", "vivit", "--data_dir", str(synth_root),
        "--log_dir", str(out), "--num_frames", "4", "--batch_size", "4",
        "--epochs", "1", "--crop_size", "64", "--seed", "3",
    ])


@pytest.fixture(scope="module")
def artifact(trained, tmp_path_factory):
    out = tmp_path_factory.mktemp("export_art") / "vivit.lxa"
    export_cli.main([
        "--model", "vivit",
        "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
        "--out", str(out), "--batch_sizes", "1,2",
        "--num_frames", "4", "--crop_size", "64",
    ])
    return out


def test_artifact_file_layout(artifact):
    assert artifact.exists()
    with zipfile.ZipFile(artifact) as zf:
        names = set(zf.namelist())
        assert "meta.json" in names
        assert {"b1.bin", "b2.bin"} <= names
        meta = json.loads(zf.read("meta.json"))
    assert meta["model"] == "vivit"
    assert meta["batch_sizes"] == [1, 2]
    assert meta["num_frames"] == 4 and meta["crop_size"] == 64
    assert set(meta["class_labels"]) == {"referral", "non_referral"}


def test_roundtrip_matches_checkpoint_predictor(trained, artifact):
    ckpt = str(Path(trained["exp_dir"]) / "best_model")
    predictor = Predictor.from_checkpoint("vivit", ckpt, num_frames=4,
                                          crop_size=64)
    exported = ExportedModel.load(artifact)
    rng = np.random.default_rng(0)
    clip = rng.integers(0, 256, (2, 4, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(
        exported.predict(clip), predictor.predict_clip(clip), atol=1e-6)


def test_batch_routing_pads_and_trims(artifact):
    exported = ExportedModel.load(artifact)
    rng = np.random.default_rng(1)
    clips = rng.integers(0, 256, (3, 4, 64, 64, 3), dtype=np.uint8)
    probs = exported.predict(clips)  # 3 > max exported batch 2: chunks 2+1
    assert probs.shape == (3, 2)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    # Identical to one-at-a-time through the b1 graph.
    singles = np.concatenate([exported.predict(c) for c in clips])
    np.testing.assert_allclose(probs, singles, atol=1e-5)


def test_inference_cli_serves_from_artifact(artifact, synth_root, tmp_path):
    video = next((synth_root / "test" / "referral").glob("*.mp4"))
    result = inference_cli.main([
        "--exported", str(artifact),
        "--video_path", str(video),
        "--log_dir", str(tmp_path),
    ])
    assert result["predicted_class"] in ("referral", "non_referral")
    assert abs(sum(result["probabilities"].values()) - 1.0) < 1e-5
    assert result["num_frames"] == 4
    out = list(tmp_path.glob("**/inference_results/*_result.json"))
    assert len(out) == 1


def test_exported_predictor_batch_mode(artifact, synth_root, tmp_path):
    results = inference_cli.main([
        "--exported", str(artifact),
        "--video_dir", str(synth_root / "test"),
        "--log_dir", str(tmp_path),
        "--batch_size", "2",
    ])
    assert len(results) == 4  # 2 classes x 2 test videos
    csvs = list(tmp_path.glob("**/inference_results/batch_results.csv"))
    assert len(csvs) == 1


def test_exported_predictor_sampling_parity(trained, artifact, synth_root):
    """Artifact-backed and checkpoint-backed predictors sample the same
    frames (per-video-seed contract rides through meta.json)."""
    ckpt = str(Path(trained["exp_dir"]) / "best_model")
    p1 = Predictor.from_checkpoint("vivit", ckpt, num_frames=4, crop_size=64)
    p2 = ExportedPredictor.load(artifact)
    video = next((synth_root / "test" / "non_referral").glob("*.mp4"))
    r1, r2 = p1.predict_video(video), p2.predict_video(video)
    assert r1["frame_indices"] == r2["frame_indices"]
    np.testing.assert_allclose(
        list(r1["probabilities"].values()),
        list(r2["probabilities"].values()), atol=1e-6)


def test_quantized_export_roundtrip(trained, artifact, tmp_path):
    """--quantize int8 bakes W8A8 graphs: smaller artifact, close probs."""
    out = tmp_path / "vivit_int8.lxa"
    export_cli.main([
        "--model", "vivit",
        "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
        "--out", str(out), "--batch_sizes", "2",
        "--num_frames", "4", "--crop_size", "64", "--quantize", "int8",
    ])
    q = ExportedModel.load(out)
    assert q.meta["quantize"] == "int8"
    f32 = ExportedModel.load(artifact)
    # int8 constants deflate far better than f32 (b2 graph vs b1+b2 f32).
    assert out.stat().st_size < artifact.stat().st_size * 0.45
    rng = np.random.default_rng(7)
    clips = rng.integers(0, 256, (2, 4, 64, 64, 3), dtype=np.uint8)
    pq, pf = q.predict(clips), f32.predict(clips)
    np.testing.assert_allclose(pq, pf, atol=0.06)
    assert (np.argmax(pq, -1) == np.argmax(pf, -1)).all()


def test_exported_model_edge_batches(artifact):
    """Empty batches return (0, C); device arrays take the no-round-trip
    fast path (pad on device, trim after) and match the host path."""
    import jax.numpy as jnp

    exported = ExportedModel.load(artifact)
    empty = exported.predict(np.zeros((0, 4, 64, 64, 3), np.uint8))
    assert empty.shape == (0, 2)

    rng = np.random.default_rng(11)
    clips = rng.integers(0, 256, (1, 4, 64, 64, 3), dtype=np.uint8)
    host = exported.predict(clips)
    dev = exported.predict(jnp.asarray(clips))  # b=1 fits the b1 graph
    np.testing.assert_allclose(dev, host, atol=1e-6)
    # b=2 on-device pads onto the b2 graph; b=3 exceeds all -> host chunking.
    clips3 = rng.integers(0, 256, (3, 4, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(exported.predict(jnp.asarray(clips3)),
                               exported.predict(clips3), atol=1e-6)


def test_bf16_weights_export(trained, artifact, tmp_path):
    """--weights_dtype bf16 halves baked constants with tiny drift."""
    out = tmp_path / "vivit_bf16.lxa"
    export_cli.main([
        "--model", "vivit",
        "--model_path", str(Path(trained["exp_dir"]) / "best_model"),
        "--out", str(out), "--batch_sizes", "2",
        "--num_frames", "4", "--crop_size", "64", "--weights_dtype", "bf16",
    ])
    bf16 = ExportedModel.load(out)
    assert bf16.meta["weights_dtype"] == "bf16"
    f32 = ExportedModel.load(artifact)
    # b2 graph vs f32's b1+b2: well under half.
    assert out.stat().st_size < artifact.stat().st_size * 0.4
    rng = np.random.default_rng(13)
    clips = rng.integers(0, 256, (2, 4, 64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(bf16.predict(clips), f32.predict(clips),
                               atol=0.02)
