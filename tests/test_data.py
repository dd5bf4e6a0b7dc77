"""Data layer tests: synthetic mp4 generation, decode, walker, loader."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data.dataset import VideoDataset, resolve_data_dir
from laryngeal_tpu.data.pipeline import ClipLoader, create_dataloaders
from laryngeal_tpu.data.synthetic import make_synthetic_dataset, synth_video
from laryngeal_tpu.data.video import decode_frames, get_video_properties, verify_video_integrity, write_video


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(root), {"train": 3, "val": 2, "test": 2}, num_frames=16, h=48, w=64, seed=1)
    return root


def test_write_and_decode_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    clip = synth_video(rng, 10, 48, 64, referral=True)
    path = tmp_path / "v.mp4"
    write_video(path, clip, fps=10)
    total, fps, dur, w, h = get_video_properties(path)
    assert total == 10 and (w, h) == (64, 48)
    assert verify_video_integrity(path)
    frames = decode_frames(path, [0, 3, 3, 9])
    assert frames.shape == (4, 48, 64, 3)
    # Duplicate index decodes to identical frame.
    np.testing.assert_array_equal(frames[1], frames[2])
    # Lossy codec: roundtrip is approximate.
    assert np.abs(frames[0].astype(int) - clip[0].astype(int)).mean() < 30


def test_decode_resize_and_bad_path(tmp_path):
    rng = np.random.default_rng(1)
    clip = synth_video(rng, 6, 48, 64, referral=False)
    path = tmp_path / "v.mp4"
    write_video(path, clip, fps=10)
    frames = decode_frames(path, [0, 5], resize_to=(32, 32))
    assert frames.shape == (2, 32, 32, 3)
    with pytest.raises(ValueError):
        decode_frames(tmp_path / "missing.mp4", [0])
    with pytest.raises(ValueError):
        decode_frames(path, [])
    assert not verify_video_integrity(tmp_path / "missing.mp4")


def test_out_of_range_index_gives_placeholder(tmp_path):
    rng = np.random.default_rng(2)
    clip = synth_video(rng, 5, 48, 64, referral=False)
    path = tmp_path / "v.mp4"
    write_video(path, clip, fps=10)
    frames = decode_frames(path, [0, 50])
    assert frames.shape == (2, 48, 64, 3)
    assert (frames[1] == 127).all()


def test_dataset_walker_and_labels(synth_root):
    ds = VideoDataset(synth_root, mode="train", num_frames=8, resize_to=(32, 32))
    assert len(ds) == 6
    assert ds.class_labels == ["non_referral", "referral"]
    # sorted policy: non_referral=0, referral=1 (coincides with hardcoded policy)
    assert ds.class_counts == {"non_referral": 3, "referral": 3}
    item = ds[0]
    assert item["pixel_values"].shape == (8, 32, 32, 3)
    assert item["pixel_values"].dtype == np.uint8
    assert item["label"] in (0, 1)
    assert len(item["frame_indices"]) == 8

    ds_ref = VideoDataset(synth_root, mode="train", num_frames=8, label_policy="referral")
    assert ds_ref.labels == ds.labels  # policies coincide for these class names


def test_dataset_layout_tolerance(tmp_path):
    # root/dataset/{mode}/{cls} nesting (vivit dataset.py:24-31)
    make_synthetic_dataset(str(tmp_path / "dataset"), {"train": 1}, num_frames=6, h=32, w=32, splits=("train",))
    assert resolve_data_dir(tmp_path, "train") == tmp_path / "dataset" / "train"
    ds = VideoDataset(tmp_path, mode="train", num_frames=4, resize_to=(32, 32))
    assert len(ds) == 2
    with pytest.raises(FileNotFoundError):
        VideoDataset(tmp_path / "nowhere", mode="train")


def test_clip_cache_hit(synth_root):
    ds = VideoDataset(synth_root, mode="val", num_frames=8, resize_to=(32, 32), cache_clips=True)
    a = ds[0]
    b = ds[0]
    assert a["pixel_values"] is b["pixel_values"]  # cached object


def test_clip_cache_epoch2_all_hits(synth_root):
    """Epoch 2 of a deterministic-sampler loader never decodes: every clip is
    a ClipCache hit. This is the rebuild's fix for the reference's
    re-decode-every-epoch hot loop (vivit_transformer/vivit_classifier/
    trainers/trainer.py:62-104, SURVEY §3.1) — measured end-to-end in
    BASELINE.md "Cached-epoch training"."""
    ds = VideoDataset(synth_root, mode="train", num_frames=8,
                      sampling_method="uniform", resize_to=(32, 32))
    assert ds.cache_clips  # default-on for deterministic samplers
    loader = ClipLoader(ds, batch_size=4, shuffle=True, seed=7)
    list(loader)  # epoch 1: all misses (cold cache)
    s1 = ds._clip_cache.stats()
    assert s1["misses"] == len(ds) and s1["hits"] == 0
    list(loader)  # epoch 2: same (path, indices) keys even under shuffle
    s2 = ds._clip_cache.stats()
    assert s2["misses"] == s1["misses"]  # zero new decodes
    assert s2["hits"] == len(ds)


def test_clip_cache_gated_off_for_stream_random(synth_root):
    """Stream-seeded random sampling draws fresh indices every epoch — the
    cache would only grow, so VideoDataset disables it (the documented
    random-sampling caveat; per_video_seed=True restores determinism and
    with it the cache)."""
    ds = VideoDataset(synth_root, mode="train", num_frames=8,
                      sampling_method="random", resize_to=(32, 32))
    assert not ds.cache_clips
    ds_seeded = VideoDataset(synth_root, mode="train", num_frames=8,
                             sampling_method="random", per_video_seed=True,
                             resize_to=(32, 32))
    assert ds_seeded.cache_clips


def test_loader_batching_and_shuffle(synth_root):
    ds = VideoDataset(synth_root, mode="train", num_frames=8, resize_to=(32, 32))
    loader = ClipLoader(ds, batch_size=4, shuffle=True, seed=7)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["pixel_values"].shape == (4, 8, 32, 32, 3)
    assert batches[1]["pixel_values"].shape == (2, 8, 32, 32, 3)
    assert batches[0]["labels"].dtype == np.int32
    # Epoch 2 shuffles differently.
    order1 = [p for b in batches for p in b["video_paths"]]
    order2 = [p for b in loader for p in b["video_paths"]]
    assert set(order1) == set(order2)
    assert order1 != order2


def test_loader_drop_last_and_pad(synth_root):
    ds = VideoDataset(synth_root, mode="train", num_frames=8, resize_to=(32, 32))
    assert len(ClipLoader(ds, batch_size=4, drop_last=True)) == 1
    loader = ClipLoader(ds, batch_size=4, pad_last=True)
    batches = list(loader)
    assert batches[-1]["pixel_values"].shape[0] == 4
    assert batches[-1]["mask"].sum() == 2


def test_create_dataloaders_surface(synth_root):
    loaders = create_dataloaders(
        str(synth_root),
        sampling_methods={"train": "random_window", "val": "uniform", "test": "uniform"},
        num_frames=8,
        batch_size=2,
        resize_to=(32, 32),
    )
    assert set(loaders) == {"train", "val", "test"}
    b = next(iter(loaders["test"]))
    assert b["pixel_values"].shape == (2, 8, 32, 32, 3)


def test_save_sampled_indices_csv(synth_root, tmp_path):
    ds = VideoDataset(
        synth_root, mode="test", sampling_method="random_window",
        num_frames=8, per_video_seed=True, resize_to=(32, 32),
    )
    path = ds.save_sampled_indices(tmp_path)
    import csv
    with open(path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["video_filename", "total_frames", "sampled_frames"]
    assert len(rows) == len(ds) + 1
    assert all(len(r[2].split(",")) == 8 for r in rows[1:])
