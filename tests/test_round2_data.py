"""Round-2 data-layer additions: bounded clip cache, public resample API,
parallel decode workers."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from laryngeal_tpu.data.dataset import ClipCache, VideoDataset
from laryngeal_tpu.data.pipeline import ClipLoader
from laryngeal_tpu.data.samplers import FrameSampler
from laryngeal_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_r2")
    make_synthetic_dataset(
        str(root), {"train": 6, "val": 2, "test": 2}, num_frames=16, h=48, w=64, seed=3)
    return root


class TestClipCache:
    def test_lru_eviction_under_byte_budget(self):
        clip = np.zeros((4, 8, 8, 3), np.uint8)  # 768 B each
        cache = ClipCache(max_bytes=2 * clip.nbytes)
        cache.put("a", clip)
        cache.put("b", clip)
        assert "a" in cache and "b" in cache
        cache.put("c", clip)  # evicts LRU = "a"
        assert "a" not in cache
        assert "b" in cache and "c" in cache
        assert cache.nbytes <= cache.max_bytes

    def test_get_refreshes_recency(self):
        clip = np.zeros((4, 8, 8, 3), np.uint8)
        cache = ClipCache(max_bytes=2 * clip.nbytes)
        cache.put("a", clip)
        cache.put("b", clip)
        assert cache.get("a") is not None  # "a" becomes most-recent
        cache.put("c", clip)  # evicts "b", not "a"
        assert "a" in cache and "b" not in cache

    def test_epoch2_hits_cache_under_uniform_sampling(self, synth_root):
        """Round-4 VERDICT #3: with the deterministic uniform sampler, the
        SECOND epoch over the train loader must be 100% cache hits (zero
        decodes) — the steady-state training feed skips the reference's
        re-decode-every-epoch hot loop (vivit trainer.py:62-104). Shuffle is
        on: cache keys are (path, indices), order-independent."""
        ds = VideoDataset(str(synth_root), mode="train",
                          sampling_method="uniform", num_frames=4,
                          resize_to=(48, 48), cache_clips=True, wire="dctp")
        loader = ClipLoader(ds, batch_size=4, shuffle=True, pad_last=True)
        for _ in loader:
            pass
        s1 = ds._clip_cache.stats()
        assert s1["misses"] == len(ds) and s1["hits"] == 0
        for _ in loader:
            pass
        s2 = ds._clip_cache.stats()
        assert s2["misses"] == s1["misses"], "epoch 2 decoded something"
        assert s2["hits"] == len(ds), "epoch 2 not fully cache-served"

    def test_oversized_clip_never_cached(self):
        cache = ClipCache(max_bytes=100)
        big = np.zeros((4, 8, 8, 3), np.uint8)
        cache.put("big", big)
        assert "big" not in cache and cache.nbytes == 0

    def test_dataset_respects_budget(self, synth_root):
        # Budget below one clip: nothing is ever cached; decode still works.
        ds = VideoDataset(synth_root, mode="train", num_frames=8,
                          resize_to=(32, 32), clip_cache_mb=0)
        item = ds[0]
        assert item["pixel_values"].shape == (8, 32, 32, 3)
        assert len(ds._clip_cache) == 0


class TestResample:
    def test_resample_is_deterministic_and_distinct(self):
        s = FrameSampler("random", 8, seed=42, per_video_seed=True)
        a0 = s("vid_x.mp4", 100)
        s.resample(1)
        a1 = s("vid_x.mp4", 100)
        s.resample(0)
        a0_again = s("vid_x.mp4", 100)
        assert a0 == a0_again
        assert a0 != a1

    def test_stream_sampler_resample_reseeds(self):
        s = FrameSampler("random_window", 8, seed=42)
        a = s("v.mp4", 100)
        s.resample(0)
        assert s("v.mp4", 100) == a  # pass 0 == nominal stream
        s.resample(3)
        b = s("v.mp4", 100)
        assert b != a

    def test_dataset_resample_clears_cache(self, synth_root):
        ds = VideoDataset(synth_root, mode="train", sampling_method="uniform",
                          num_frames=8, resize_to=(32, 32))
        _ = ds[0]
        assert len(ds._clip_cache) == 1
        ds.resample_clips(1)
        assert len(ds._clip_cache) == 0
        assert ds.sampler.salt == 1
        ds.resample_clips(0)
        assert ds.sampler.salt == 0


class TestParallelDecode:
    def test_worker_pool_batches_match_serial(self, synth_root):
        kwargs = dict(mode="train", sampling_method="random", num_frames=8,
                      resize_to=(32, 32), seed=7)
        ds_a = VideoDataset(synth_root, **kwargs)
        ds_b = VideoDataset(synth_root, **kwargs)
        serial = list(ClipLoader(ds_a, batch_size=3, num_workers=1, seed=7))
        pooled = list(ClipLoader(ds_b, batch_size=3, num_workers=4, seed=7))
        assert len(serial) == len(pooled)
        for sb, pb in zip(serial, pooled):
            # Planning is serial in both: RNG stream order (and hence frame
            # indices and pixels) must be identical regardless of pool size.
            assert sb["video_paths"] == pb["video_paths"]
            assert sb["frame_indices"] == pb["frame_indices"]
            np.testing.assert_array_equal(sb["pixel_values"], pb["pixel_values"])
            np.testing.assert_array_equal(sb["labels"], pb["labels"])


class TestDiskClipCache:
    def test_disk_cache_survives_process_state(self, synth_root, tmp_path):
        import laryngeal_tpu.data.dataset as D

        cache_dir = tmp_path / "clips"
        ds1 = VideoDataset(synth_root, mode="train", num_frames=8,
                           resize_to=(32, 32), cache_dir=str(cache_dir))
        item1 = ds1[0]
        assert len(list(cache_dir.glob("*.npy"))) == 1

        # Fresh dataset (simulates a new process: empty RAM cache) with
        # decode disabled entirely — the clip must come from disk.
        ds2 = VideoDataset(synth_root, mode="train", num_frames=8,
                           resize_to=(32, 32), cache_dir=str(cache_dir))

        def boom(*a, **k):
            raise AssertionError("decode should not be called on a disk hit")

        import laryngeal_tpu.data.native as native
        orig = native.decode_frames_auto
        native.decode_frames_auto = boom
        try:
            item2 = ds2[0]
        finally:
            native.decode_frames_auto = orig
        np.testing.assert_array_equal(item1["pixel_values"], item2["pixel_values"])

    def test_disk_cache_key_includes_indices_and_size(self, synth_root, tmp_path):
        cache_dir = tmp_path / "clips2"
        ds = VideoDataset(synth_root, mode="train", num_frames=8,
                          resize_to=(32, 32), cache_dir=str(cache_dir))
        _ = ds[0]
        ds_big = VideoDataset(synth_root, mode="train", num_frames=8,
                              resize_to=(48, 48), cache_dir=str(cache_dir))
        item = ds_big[0]
        assert item["pixel_values"].shape[1:] == (48, 48, 3)
        assert len(list(cache_dir.glob("*.npy"))) == 2

    def test_corrupt_disk_entry_is_a_miss(self, synth_root, tmp_path):
        from laryngeal_tpu.data.dataset import DiskClipCache

        cache = DiskClipCache(tmp_path / "c3")
        key = ("/some/video.mp4", (0, 1, 2), (32, 32))
        cache._file(key).write_bytes(b"garbage")
        assert cache.get(key) is None
        clip = np.zeros((2, 4, 4, 3), np.uint8)
        cache.put(key, clip)
        np.testing.assert_array_equal(cache.get(key), clip)
