"""Dataset walker + clip loading — one implementation for all five pipelines.

Replaces the five near-identical ``VideoDataset`` copies in the reference
(canonical: ``vivit_transformer/vivit_classifier/data_config/dataset.py``).

Directory-layout tolerance matches the reference exactly
(dataset.py:24-31): given ``root_dir`` and ``mode``, data is found at
``root/dataset/{mode}`` if ``root/dataset`` exists, else ``root/{mode}`` if it
exists, else ``root/dataset/{mode}`` (and a FileNotFoundError if absent).

Label policies (both exist in the reference):
- ``sorted``: labels from sorted class-dir names (ViViT/TimeSformer,
  dataset.py:80-85). For {non_referral, referral} this yields referral=1.
- ``referral``: hardcoded ``referral``->1, everything else 0
  (resnet50-3d-video dataset.py:68-73, 2d-lstm, swin).
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

from .samplers import FrameSampler
from .video import decode_frames, get_video_properties, verify_video_integrity

logger = logging.getLogger(__name__)

VIDEO_EXTENSIONS = (".mp4",)  # the reference globs *.mp4 only


def resolve_data_dir(root_dir, mode: str) -> Path:
    root = Path(root_dir)
    if not (root / "dataset").exists():
        if (root / mode).exists():
            return root / mode
        return root / "dataset" / mode
    return root / "dataset" / mode


class ClipCache:
    """Byte-budgeted LRU cache for decoded uint8 clips.

    The reference re-decodes every video every epoch; caching decoded clips
    is the rebuild's fix — but an unbounded dict is a silent OOM on datasets
    larger than duhs-gss's 132 videos. Entries are evicted least-recently-used
    once the byte budget is exceeded. Default budget (2 GiB) holds ~3400
    clips at 32x224x224x3 uint8.
    """

    def __init__(self, max_bytes: int = 2 << 30):
        import threading

        self.max_bytes = int(max_bytes)
        self._store: "OrderedDict" = OrderedDict()
        self._bytes = 0
        self._lock = threading.Lock()  # decode workers share the cache
        self.n_hits = 0
        self.n_misses = 0

    def __contains__(self, key) -> bool:
        with self._lock:
            return key in self._store

    def __len__(self) -> int:
        return len(self._store)

    @property
    def nbytes(self) -> int:
        return self._bytes

    @staticmethod
    def _nbytes(clip) -> int:
        # Entries are arrays or wire-format tuples of arrays (dct wire).
        if isinstance(clip, tuple):
            return sum(a.nbytes for a in clip)
        return clip.nbytes

    def get(self, key):
        with self._lock:
            clip = self._store.get(key)
            if clip is not None:
                self._store.move_to_end(key)
                self.n_hits += 1
            else:
                self.n_misses += 1
            return clip

    def stats(self) -> dict:
        with self._lock:
            return {"hits": self.n_hits, "misses": self.n_misses,
                    "entries": len(self._store), "bytes": self._bytes}

    def put(self, key, clip) -> None:
        nbytes = self._nbytes(clip)
        if nbytes > self.max_bytes:
            return  # one clip over budget: never cache, never evict others
        with self._lock:
            if key in self._store:
                self._bytes -= self._nbytes(self._store.pop(key))
            self._store[key] = clip
            self._bytes += nbytes
            while self._bytes > self.max_bytes and self._store:
                _, evicted = self._store.popitem(last=False)
                self._bytes -= self._nbytes(evicted)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()
            self._bytes = 0


class DiskClipCache:
    """Optional persistent clip-cache tier: decoded uint8 clips as .npy
    files keyed by (path, mtime, indices, size). Survives process restarts
    (the RAM ClipCache does not) and holds datasets larger than RAM; writes
    are atomic (tempfile + rename) so concurrent workers/processes can share
    a directory. No eviction — the directory is a user-managed artifact,
    like the reference's preprocessed-dataset mirrors."""

    def __init__(self, cache_dir):
        self.dir = Path(cache_dir)
        self.dir.mkdir(parents=True, exist_ok=True)

    def _file(self, key) -> Path:
        import hashlib

        path, indices, resize, *rest = key  # rest: wire format (and future)
        try:
            mtime = int(Path(path).stat().st_mtime)
        except OSError:
            mtime = 0
        raw = f"{Path(path).resolve()}|{mtime}|{indices}|{resize}|{rest}"
        return self.dir / (hashlib.sha1(raw.encode()).hexdigest() + ".npy")

    def get(self, key):
        f = self._file(key)
        if not f.exists():
            return None
        try:
            return np.load(f)
        except Exception:
            return None  # truncated/corrupt entry: treat as miss

    def put(self, key, clip: np.ndarray) -> None:
        import os
        import tempfile

        f = self._file(key)
        try:
            fd, tmp = tempfile.mkstemp(dir=str(self.dir), suffix=".tmp")
            with os.fdopen(fd, "wb") as fh:
                np.save(fh, clip)
            os.replace(tmp, f)
        except OSError:
            pass  # cache is best-effort; decode still succeeded


class VideoDataset:
    """Walks ``{data_dir}/{class}/*.mp4``, assigns labels, samples frame
    indices, and decodes fixed-length uint8 clips.

    Unlike the reference (which re-decodes every video every epoch — its main
    host-side perf bug), decoded clips can be cached in RAM (``cache_clips``,
    byte-budget LRU) and optionally on disk (``cache_dir``, persistent):
    132 videos x 32 x 224x224x3 uint8 ~= 0.6 GB. Training-time random
    samplers still resample indices per epoch unless per-video seeding is on;
    the cache key includes the index tuple.
    """

    def __init__(
        self,
        root_dir,
        mode: str = "train",
        sampling_method: str = "uniform",
        num_frames: int = 32,
        label_policy: str = "sorted",
        per_video_seed: bool = False,
        seed: int = 42,
        verify_integrity: bool = False,
        resize_to: Optional[tuple] = (224, 224),
        cache_clips: bool = True,
        clip_cache_mb: int = 2048,
        cache_dir=None,
        video_paths: Optional[Sequence[str]] = None,
        wire: str = "rgb",
        wire_quality: int = 75,
        wire_keep_ac: int = 31,
        wire_pack_from: int = 14,
        wire_lowres: int = 0,
    ):
        self.root_dir = Path(root_dir)
        self.mode = mode
        self.num_frames = int(num_frames)
        self.sampling_method = sampling_method
        self.resize_to = resize_to
        # Host->device wire format of pixel_values (rgb | i420 | delta |
        # dct | dctp — see preprocess.transforms.decode_wire_batch). Non-rgb
        # wires decode straight to codec-native 4:2:0 planes (no host RGB
        # pass) and the clip caches hold the smaller encoded payloads.
        if wire not in ("rgb", "i420", "delta", "dct", "dctp"):
            raise ValueError(f"Unknown wire format {wire!r}")
        # wire_lowres=n (non-rgb wires): decode the source at 1/2**n
        # resolution (native mpeg4 `lowres` — the decoder's own partial
        # iDCT) and carry the reduced geometry through the wire; the jitted
        # step's preprocess resizes back to the crop. ~4x less decode
        # transform work + 4x fewer wire bytes; lossy, drift + a learning
        # A/B pinned in BASELINE.md's round-4 lowres study.
        self.wire_lowres = int(wire_lowres) if wire != "rgb" else 0
        if wire != "rgb":
            # Native-size decode (resize_to=None) would make the payload
            # geometry video-dependent while the jitted step's wire_hw is
            # static — and non-16-divisible sizes break the 4:2:0/DCT tiling.
            # Fail here, loudly, not per-clip inside materialize().
            if resize_to is None:
                raise ValueError(
                    f"wire={wire!r} requires an explicit resize_to (the wire "
                    f"payload geometry must be static); got resize_to=None")
            ww, wh = (resize_to[0] >> self.wire_lowres,
                      resize_to[1] >> self.wire_lowres)
            if ww % 16 or wh % 16:
                raise ValueError(
                    f"wire={wire!r} needs (resize_to >> wire_lowres) "
                    f"multiples of 16, got {resize_to} >> {self.wire_lowres}"
                    f" = {(ww, wh)}")
            self.wire_wh = (ww, wh)  # (w, h) — the payload geometry
        self.wire = wire
        self.wire_quality = int(wire_quality)
        self.wire_keep_ac = int(wire_keep_ac)
        self.wire_pack_from = int(wire_pack_from)
        # Caching decoded clips only pays when the same indices recur:
        # uniform sampling and per-video-seeded samplers are deterministic;
        # stream-seeded stochastic samplers draw fresh indices every epoch,
        # and caching those would grow host RAM without bound.
        self.cache_clips = cache_clips and (
            per_video_seed or sampling_method == "uniform"
        )
        self._clip_cache = ClipCache(max_bytes=int(clip_cache_mb) << 20)
        self._disk_cache = DiskClipCache(cache_dir) if cache_dir else None
        self._props_cache: Dict = {}

        self.sampler = FrameSampler(
            sampling_method, num_frames, seed=seed, per_video_seed=per_video_seed
        )

        self.video_paths: List[str] = []
        self.labels: List[int] = []
        self.class_labels: List[str] = []

        if video_paths is not None:
            # Inference mode: explicit file list, dummy labels (the
            # timesformer dataset's mode='inference' branch).
            self.video_paths = [str(p) for p in video_paths]
            self.labels = [0] * len(self.video_paths)
            self.class_labels = ["non_referral", "referral"]
        else:
            self.data_dir = resolve_data_dir(root_dir, mode)
            self._load(label_policy, verify_integrity)

    def _load(self, label_policy: str, verify: bool) -> None:
        if not self.data_dir.exists():
            raise FileNotFoundError(f"Data directory not found: {self.data_dir}")
        class_dirs = sorted(d for d in self.data_dir.iterdir() if d.is_dir())
        self.class_labels = [d.name for d in class_dirs]
        label_map = {name: i for i, name in enumerate(self.class_labels)}

        for class_dir in class_dirs:
            if label_policy == "referral":
                label = 1 if class_dir.name == "referral" else 0
            else:
                label = label_map[class_dir.name]
            files = sorted(class_dir.glob("*.mp4"))
            if verify:
                files = [f for f in files if verify_video_integrity(f)]
            for f in files:
                self.video_paths.append(str(f))
                self.labels.append(label)
        logger.info(
            "Found %d videos for %s (classes=%s)",
            len(self.video_paths), self.mode, self.class_labels,
        )

    def __len__(self) -> int:
        return len(self.video_paths)

    def resample_clips(self, pass_idx: int) -> None:
        """Public contract for clip-averaged evaluation: draw a fresh (but
        deterministic) clip per video for pass ``pass_idx`` and invalidate
        decoded clips keyed by the previous pass's indices."""
        self.sampler.resample(pass_idx)
        self._clip_cache.clear()

    def video_properties(self, path: str):
        if path not in self._props_cache:
            self._props_cache[path] = get_video_properties(path)
        return self._props_cache[path]

    def plan(self, idx: int) -> Dict:
        """Probe + sample frame indices for item ``idx``. MUST run serially in
        dataset-iteration order: stream-seeded samplers (ViViT-family) consume
        one RNG draw per video, and reference index parity depends on the
        draw order. Returns a decode plan consumed by ``materialize``."""
        path = self.video_paths[idx]
        label = self.labels[idx]
        try:
            total_frames, *_ = self.video_properties(path)
            indices = self.sampler(path, total_frames)
        except Exception as e:
            logger.warning("Could not probe %s: %s — placeholder clip", path, e)
            indices = None
        return {"video_path": path, "label": int(label), "frame_indices": indices}

    def _placeholder_clip(self):
        """Gray placeholder in the configured wire format (robustness
        contract, vivit dataset.py:370-381)."""
        if self.wire == "rgb":
            hw = self.resize_to or (224, 224)
            return np.full((self.num_frames, hw[1], hw[0], 3), 127, np.uint8)
        ww, wh = self.wire_wh
        rgb = np.full((self.num_frames, wh, ww, 3), 127, np.uint8)
        return self._encode_wire(self._rgb_to_i420(rgb))

    @staticmethod
    def _rgb_to_i420(rgb: np.ndarray) -> np.ndarray:
        from .video import rgb_to_yuv420

        return rgb_to_yuv420(rgb)

    def _encode_wire(self, i420: np.ndarray):
        """I420 clip -> the configured wire payload (identity for i420)."""
        if self.wire == "delta":
            from ..preprocess.transforms import temporal_delta_encode

            return temporal_delta_encode(i420)
        if self.wire == "dct":
            from ..preprocess.dct_wire import encode_clip

            return encode_clip(i420, self.wire_quality, self.wire_keep_ac)
        if self.wire == "dctp":
            from ..preprocess.dct_wire import encode_clip_packed

            return encode_clip_packed(i420, self.wire_quality,
                                      self.wire_keep_ac, self.wire_pack_from)
        return i420

    def materialize(self, plan: Dict) -> Dict:
        """Decode the planned clip. Thread-safe (the clip cache is locked;
        decode touches no shared sampler state) — ClipLoader fans these out
        over a worker pool, the TPU replacement for the reference's
        ``DataLoader(num_workers=N)`` processes."""
        path, label, indices = (
            plan["video_path"], plan["label"], plan["frame_indices"])
        # Robustness contract (vivit dataset.py:370-381): any decode failure
        # yields a gray placeholder clip with empty frame_indices, never an
        # exception out of the data path.
        if indices is None:
            return {"pixel_values": self._placeholder_clip(), "label": label,
                    "video_path": path, "frame_indices": []}

        key = (path, tuple(indices))
        clip = self._clip_cache.get(key) if self.cache_clips else None
        if clip is None:
            # The dct/dctp payloads are array tuples — np.save-backed disk
            # caching covers the dense-array wires only.
            disk_key = (path, tuple(indices), self.resize_to, self.wire,
                        self.wire_lowres)
            use_disk = (self._disk_cache is not None
                        and self.wire not in ("dct", "dctp"))
            if use_disk:
                clip = self._disk_cache.get(disk_key)
            if clip is None:
                try:
                    from .native import decode_frames_auto

                    if self.wire == "rgb":
                        clip = decode_frames_auto(
                            path, indices, resize_to=self.resize_to,
                            fmt="rgb")
                    else:
                        clip = decode_frames_auto(
                            path, indices, resize_to=self.wire_wh,
                            fmt="i420", lowres=self.wire_lowres)
                        clip = self._encode_wire(clip)
                except Exception as e:
                    logger.warning("Decode failed for %s: %s — placeholder clip",
                                   path, e)
                    clip = self._placeholder_clip()
                if use_disk:
                    self._disk_cache.put(disk_key, clip)
            if self.cache_clips:
                self._clip_cache.put(key, clip)
        return {
            "pixel_values": clip,
            "label": label,
            "video_path": path,
            "frame_indices": list(indices),
        }

    def rgb_clip(self, idx: int, indices=None) -> np.ndarray:
        """Decoded RGB clip regardless of wire format — visualization only
        (plots need displayable frames; the training feed ships the wire).
        Pass ``indices`` from an already-materialized item to avoid drawing
        the stream-seeded samplers a second time."""
        hw = self.resize_to or (224, 224)
        if indices is None:
            indices = self.plan(idx)["frame_indices"]
        if not indices:
            return np.full((self.num_frames, hw[1], hw[0], 3), 127, np.uint8)
        from .native import decode_frames_auto

        try:
            return decode_frames_auto(self.video_paths[idx], indices,
                                      resize_to=self.resize_to)
        except Exception:
            return np.full((self.num_frames, hw[1], hw[0], 3), 127, np.uint8)

    def __getitem__(self, idx: int) -> Dict:
        return self.materialize(self.plan(idx))

    def save_sampled_indices(self, log_dir) -> Optional[str]:
        """CSV audit of per-video sampled indices
        (resnet50-3d-video/.../dataset.py:245-288)."""
        import csv
        import os

        if not log_dir:
            return None
        for p in self.video_paths:
            total = self.video_properties(p)[0]
            self.sampler(p, total)
        path = os.path.join(
            str(log_dir), f"sampled_frames_{self.mode}_{self.sampling_method}.csv"
        )
        cache = self.sampler.cached_indices
        with open(path, "w", newline="") as f:
            wr = csv.writer(f)
            wr.writerow(["video_filename", "total_frames", "sampled_frames"])
            for p in sorted(self.video_paths):
                total = self.video_properties(p)[0]
                idx = cache.get(p) or self.sampler(p, total)
                wr.writerow([os.path.basename(p), total, ",".join(map(str, idx))])
        return path

    @property
    def class_counts(self) -> Dict[str, int]:
        counts: Dict[str, int] = {}
        for lbl in self.labels:
            name = self.class_labels[lbl] if lbl < len(self.class_labels) else str(lbl)
            counts[name] = counts.get(name, 0) + 1
        return counts
