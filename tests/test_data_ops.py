"""Tests for data-ops (splitters/organizers/artifacts) and the HF path."""

import csv
import json
from pathlib import Path

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data import ops
from laryngeal_tpu.data.artifacts import (
    dataset_split_statistics,
    download_dataset_artifact,
    save_dataset_artifact,
)
from laryngeal_tpu.data.synthetic import make_synthetic_dataset, synth_video
from laryngeal_tpu.data.video import write_video


def make_flat_videos(root, n_ref=7, n_non=5):
    rng = np.random.default_rng(0)
    for cls, n in (("referral", n_ref), ("non_referral", n_non)):
        d = Path(root) / cls
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            write_video(d / f"{cls}_{i:02d}.mp4", synth_video(rng, 4, 32, 32, cls == "referral"), fps=8)


def test_stratified_split_fractions_and_determinism():
    items = [f"v{i}" for i in range(100)]
    labels = ["a"] * 60 + ["b"] * 40
    s1 = ops.stratified_split(items, labels, (0.7, 0.15, 0.15), seed=1)
    s2 = ops.stratified_split(items, labels, (0.7, 0.15, 0.15), seed=1)
    assert s1 == s2
    assert len(s1["train"]) == 70 and len(s1["val"]) == 15 and len(s1["test"]) == 15
    # Stratification: each split keeps the 60/40 ratio.
    train_a = sum(1 for v in s1["train"] if items.index(v) < 60)
    assert train_a == 42
    with pytest.raises(ValueError):
        ops.stratified_split(items, labels, (0.5, 0.2, 0.2))


def test_create_balanced_splits(tmp_path):
    src = tmp_path / "src"
    make_flat_videos(src, 7, 5)
    out = tmp_path / "out"
    stats = ops.create_balanced_splits(src, out, seed=42)
    assert set(stats) == {"train", "val", "test"}
    total = sum(sum(v.values()) for v in stats.values())
    assert total == 12
    assert (out / "split_statistics.json").exists()
    assert len(list((out / "train" / "referral").glob("*.mp4"))) == stats["train"]["referral"]


def test_wandb_table_to_csv_and_grade_mapping(tmp_path):
    table = {"columns": ["File Name", "Grade"],
             "data": [["a.mp4", 1], ["b.mp4", 2], ["c.mp4", 3],
                      ["a.mp4", 1], ["d.mp4", 1]]}
    p = tmp_path / "train.table.json"
    p.write_text(json.dumps(table))
    out = tmp_path / "train.table_unique.csv"
    n = ops.wandb_table_to_csv(p, out)
    assert n == 4  # deduped
    rows = list(csv.DictReader(open(out)))
    labels = {r["File Name"]: int(r["Label"]) for r in rows}
    assert labels == {"a.mp4": 0, "b.mp4": 1, "c.mp4": 1, "d.mp4": 0}
    assert ops.grade_to_binary_label(1) == 0
    assert ops.grade_to_binary_label(3) == 1


def test_organize_from_csv(tmp_path):
    src = tmp_path / "videos"
    make_flat_videos(src, 2, 2)
    csv_dir = tmp_path / "csvs"
    csv_dir.mkdir()
    with open(csv_dir / "train.table_unique.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["File Name", "Grade", "Label"])
        w.writerow(["referral_00.mp4", 2, 1])
        w.writerow(["non_referral_00.mp4", 1, 0])
    out = tmp_path / "organized"
    copied = ops.organize_from_csv(csv_dir, src, out)
    assert copied == {"train": 2}
    assert (out / "train" / "referral" / "referral_00.mp4").exists()
    assert (out / "train" / "non-referral" / "non_referral_00.mp4").exists()


def test_flat_class_split(tmp_path):
    src = tmp_path / "videos"
    make_flat_videos(src, 1, 1)
    cp = tmp_path / "labels.csv"
    with open(cp, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["File Name", "Label"])
        w.writerow(["referral_00.mp4", 1])
        w.writerow(["non_referral_00.mp4", 0])
    counts = ops.flat_class_split(cp, src, tmp_path / "flat")
    assert counts == {"referral": 1, "non_referral": 1}


def test_count_files(tmp_path):
    (tmp_path / "a" / "b").mkdir(parents=True)
    (tmp_path / "a" / "x.txt").write_text("1")
    (tmp_path / "a" / "b" / "y.txt").write_text("2")
    assert ops.count_files(tmp_path) == {"files": 2, "folders": 2}
    assert ops.count_files(tmp_path, recursive=False) == {"files": 0, "folders": 1}


def test_artifact_roundtrip_local(tmp_path, monkeypatch):
    import laryngeal_tpu.data.artifacts as A

    monkeypatch.setattr(A, "LOCAL_STORE", tmp_path / "store")
    ds = tmp_path / "ds"
    make_synthetic_dataset(str(ds), {"train": 1}, num_frames=4, h=32, w=32, splits=("train",))
    stats = dataset_split_statistics(ds)
    assert stats["train"] == {"non_referral": 1, "referral": 1}
    ref = save_dataset_artifact(ds, "test_ds")
    path = download_dataset_artifact("test_ds")
    assert Path(path).exists()
    assert (Path(path) / "train" / "referral").exists()
    # Versioning: second save -> v1.
    save_dataset_artifact(ds, "test_ds")
    assert Path(download_dataset_artifact("test_ds")).parent.name == "v1"
    with pytest.raises(FileNotFoundError):
        download_dataset_artifact("nope")


def test_hf_datasets_path(tmp_path):
    pytest.importorskip("datasets")
    from laryngeal_tpu.data.hf_datasets import (
        collate_fn,
        compute_metrics,
        create_dataset,
        frames_convert_and_create_dataset_dictionary,
        sample_frame_indices,
    )

    idx = sample_frame_indices(8, 2, 100)
    assert len(idx) == 8 and idx.max() < 100
    idx_short = sample_frame_indices(8, 2, 10)
    assert len(idx_short) == 8 and idx_short.max() < 10

    make_synthetic_dataset(str(tmp_path), {"train": 2}, num_frames=8, h=32, w=32,
                           splits=("train",))
    examples = frames_convert_and_create_dataset_dictionary(tmp_path, clip_len=4)
    assert len(examples) == 4
    assert examples[0]["video"].shape == (4, 224, 224, 3)

    split = create_dataset(examples, model_type="vivit", test_size=0.25)
    assert len(split["train"]) == 3 and len(split["test"]) == 1
    batch = collate_fn([split["train"][i] for i in range(2)])
    assert batch["pixel_values"].shape == (2, 4, 224, 224, 3)
    m = compute_metrics((np.array([[0.1, 0.9], [0.8, 0.2]]), np.array([1, 0])))
    assert m["accuracy"] == 1.0
