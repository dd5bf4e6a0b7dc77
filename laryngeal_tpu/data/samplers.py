"""Frame-index samplers — the reference repo's core algorithmic asset.

Behavioral parity with the reference sampling algorithms (all five pipelines
share them; canonical copies at
``vivit_transformer/vivit_classifier/data_config/dataset.py:129-193`` and
``resnet50-3d-video/video_classifier/data_config/dataset.py:80-170``):

Three methods, each with a distinct short-video (``total_frames < num_frames``)
branch:

``uniform``
    T >= N: ``step=(T-1)/(N-1)``, ``idx_i=min(int(i*step), T-1)``;
    N == 1: middle frame ``[T//2]``.
    T < N : ``step=T/N`` (duplicates), ``idx_i=min(int(i*step), T-1)``.
``random``
    T >= N: ``sorted(sample(range(T), N))`` (no replacement).
    T < N : ``sorted(choices(range(T), k=N))`` (with replacement).
``random_window``
    T >= N: window ``w=T/N``; per window ``randint(start, end-1)`` with
    ``start=int(i*w)``, ``end=max(min(int((i+1)*w), T), start+1)``.
    T < N : fractional virtual windows,
    ``min(int(floor(v_start+(v_end-v_start)*random())), T-1)``.

Seeding policies (both exist in the reference):

- **stream**: one RNG seeded once (seed 42 at dataset init); videos consume
  from it in iteration order (vivit/timesformer/swin/2d-lstm datasets).
- **per-video**: RNG re-seeded per video from a hash of the file basename
  (``resnet50-3d-video/.../dataset.py:91-98``). The reference uses Python's
  builtin ``hash()`` which is salted per-process (PYTHONHASHSEED) and thus NOT
  reproducible across runs — a documented reference bug. We default to a
  stable CRC32-based seed (``stable_video_seed``); pass
  ``hash_fn='python'`` to reproduce the reference's in-process behavior.

These run on the host (they drive decode); they are deliberately NOT jitted —
per-clip randomness happens outside the XLA graph, and the resulting index
vectors are static inputs to the device pipeline.
"""

from __future__ import annotations

import math
import os
import random
import zlib
from typing import List, Optional, Sequence

SAMPLING_METHODS = ("uniform", "random", "random_window")


def stable_video_seed(video_path: str) -> int:
    """Deterministic per-video seed from the file basename.

    Stable across processes/runs (unlike the reference's salted ``hash()``,
    ``resnet50-3d-video/.../dataset.py:95``). Range matches the reference's
    ``% 10_000_000``.
    """
    basename = os.path.basename(str(video_path))
    return zlib.crc32(basename.encode("utf-8")) % 10_000_000


def python_hash_video_seed(video_path: str) -> int:
    """Reference-exact per-video seed (salted builtin hash — in-process only)."""
    return int(hash(os.path.basename(str(video_path))) % 10_000_000)


def _check_args(t: int, n: int) -> None:
    if t <= 0:
        raise ValueError(f"total_frames must be > 0, got {t}")
    if n <= 0:
        raise ValueError(f"num_frames must be > 0, got {n}")


def uniform_indices(total_frames: int, num_frames: int) -> List[int]:
    """Deterministic uniform sampling (reference dataset.py:156-162,184-190)."""
    t, n = int(total_frames), int(num_frames)
    _check_args(t, n)
    if n == 1:
        return [t // 2]
    if t >= n:
        step = (t - 1) / (n - 1)
        return [min(int(i * step), t - 1) for i in range(n)]
    # Short video: evenly spaced with duplicates.
    step = t / n
    return [min(int(i * step), t - 1) for i in range(n)]


def random_indices(total_frames: int, num_frames: int, rng: random.Random) -> List[int]:
    """Random sampling; without replacement when possible (dataset.py:142-144,168-171)."""
    t, n = int(total_frames), int(num_frames)
    _check_args(t, n)
    if t >= n:
        return sorted(rng.sample(range(t), n))
    return sorted(rng.choices(range(t), k=n))


def random_window_indices(
    total_frames: int, num_frames: int, rng: random.Random
) -> List[int]:
    """One random frame per (possibly fractional) temporal window
    (dataset.py:145-155,172-183)."""
    t, n = int(total_frames), int(num_frames)
    _check_args(t, n)
    window_size = t / n
    indices: List[int] = []
    if t >= n:
        for i in range(n):
            start = int(i * window_size)
            end = min(int((i + 1) * window_size), t)
            end = max(end, start + 1)
            indices.append(rng.randint(start, end - 1))
    else:
        for i in range(n):
            v_start = i * window_size
            v_end = (i + 1) * window_size
            idx = min(int(math.floor(v_start + (v_end - v_start) * rng.random())), t - 1)
            indices.append(idx)
    return indices


def sample_indices(
    method: str,
    total_frames: int,
    num_frames: int,
    rng: Optional[random.Random] = None,
) -> List[int]:
    """Dispatch on sampling method. ``rng`` is required for stochastic methods."""
    if method == "uniform":
        return uniform_indices(total_frames, num_frames)
    if rng is None:
        rng = random.Random(42)
    if method == "random":
        return random_indices(total_frames, num_frames, rng)
    if method == "random_window":
        return random_window_indices(total_frames, num_frames, rng)
    raise ValueError(f"Unknown sampling method {method!r}; expected one of {SAMPLING_METHODS}")


class FrameSampler:
    """Stateful sampler holding the seeding policy.

    Parameters
    ----------
    method:
        'uniform' | 'random' | 'random_window'.
    num_frames:
        Clip length N.
    seed:
        Stream seed (reference uses 42).
    per_video_seed:
        If True, re-seed per video from a hash of the basename and cache the
        resulting indices (3D-ResNet pipeline behavior,
        ``resnet50-3d-video/.../dataset.py:91-98,163-167``); otherwise draw
        from one running stream (ViViT-family behavior).
    hash_fn:
        'stable' (default; CRC32, reproducible) or 'python' (reference-exact,
        salted per process).
    """

    def __init__(
        self,
        method: str = "uniform",
        num_frames: int = 32,
        seed: int = 42,
        per_video_seed: bool = False,
        hash_fn: str = "stable",
    ):
        if method not in SAMPLING_METHODS:
            raise ValueError(f"Unknown sampling method {method!r}")
        if hash_fn not in ("stable", "python"):
            raise ValueError(f"hash_fn must be 'stable' or 'python', got {hash_fn!r}")
        self.method = method
        self.num_frames = int(num_frames)
        self.seed = int(seed)
        self.per_video_seed = bool(per_video_seed)
        self.hash_fn = hash_fn
        # Mixed into per-video seeds; lets multi-clip evaluation draw a
        # distinct-but-deterministic clip per pass (salt = pass index).
        self.salt = 0
        self._rng = random.Random(self.seed)
        self._cache: dict = {}

    def reset(self) -> None:
        self._rng = random.Random(self.seed)
        self._cache.clear()

    def resample(self, pass_idx: int = 0) -> None:
        """Re-key the sampler for evaluation pass ``pass_idx`` (clip-averaged
        eval): per-video seeds get ``pass_idx`` as an additive salt and the
        stream RNG reseeds to ``seed + pass_idx``. ``resample(0)`` restores
        the nominal epoch-0 stream. Deterministic: the same pass index always
        yields the same indices for a given video set/iteration order."""
        self.salt = int(pass_idx)
        self._rng = random.Random(self.seed + int(pass_idx))

    def video_seed(self, video_path: str) -> int:
        if self.hash_fn == "python":
            return python_hash_video_seed(video_path)
        return stable_video_seed(video_path)

    def __call__(self, video_path: str, total_frames: int) -> List[int]:
        if self.per_video_seed:
            key = (str(video_path), self.salt)
            if key in self._cache:
                return self._cache[key]
            rng = random.Random(self.video_seed(str(video_path)) + self.salt)
            indices = sample_indices(self.method, total_frames, self.num_frames, rng)
            self._cache[key] = indices
            return indices
        return sample_indices(self.method, total_frames, self.num_frames, self._rng)

    @property
    def cached_indices(self) -> dict:
        """Per-video index cache for the current salt (per_video_seed mode)."""
        return {k[0]: v for k, v in self._cache.items() if k[1] == self.salt}
