"""Golden tests for frame samplers — parity with the reference algorithms.

The expected values are derived by executing the reference's published
formulas (vivit_transformer/.../data_config/dataset.py:129-193) directly with
Python's ``random`` module here in the test, NOT by importing reference code.
"""

import math
import random

import pytest

from laryngeal_tpu.data.samplers import (
    FrameSampler,
    random_indices,
    random_window_indices,
    sample_indices,
    stable_video_seed,
    uniform_indices,
)


# ---------- uniform ----------

def reference_uniform(t, n):
    if n == 1:
        return [t // 2]
    if t >= n:
        step = (t - 1) / (n - 1)
        return [min(int(i * step), t - 1) for i in range(n)]
    step = t / n
    return [min(int(i * step), t - 1) for i in range(n)]


@pytest.mark.parametrize("t,n", [(300, 32), (100, 16), (32, 32), (33, 32), (10, 32), (1, 32), (7, 3), (100, 1), (5, 1)])
def test_uniform_matches_reference_formula(t, n):
    assert uniform_indices(t, n) == reference_uniform(t, n)


def test_uniform_golden():
    # Hand-checked vectors.
    assert uniform_indices(10, 4) == [0, 3, 6, 9]
    assert uniform_indices(5, 5) == [0, 1, 2, 3, 4]
    assert uniform_indices(100, 1) == [50]
    # Short video with duplicates: step = 3/8
    assert uniform_indices(3, 8) == [0, 0, 0, 1, 1, 1, 2, 2]


def test_uniform_bounds_and_monotone():
    for t in (1, 2, 5, 31, 32, 33, 1000):
        for n in (1, 2, 8, 32, 64):
            idx = uniform_indices(t, n)
            assert len(idx) == n
            assert all(0 <= i < t for i in idx)
            assert idx == sorted(idx)


# ---------- random ----------

@pytest.mark.parametrize("t,n,seed", [(300, 32, 42), (50, 16, 7), (32, 32, 42), (10, 32, 42), (3, 8, 123)])
def test_random_matches_reference_formula(t, n, seed):
    ref_rng = random.Random(seed)
    if t >= n:
        expected = sorted(ref_rng.sample(range(t), n))
    else:
        expected = sorted(ref_rng.choices(range(t), k=n))
    assert random_indices(t, n, random.Random(seed)) == expected


def test_random_no_replacement_when_possible():
    idx = random_indices(100, 32, random.Random(0))
    assert len(set(idx)) == 32


# ---------- random_window ----------

def reference_random_window(t, n, rng):
    w = t / n
    out = []
    if t >= n:
        for i in range(n):
            start = int(i * w)
            end = min(int((i + 1) * w), t)
            end = max(end, start + 1)
            out.append(rng.randint(start, end - 1))
    else:
        for i in range(n):
            vs, ve = i * w, (i + 1) * w
            out.append(min(int(math.floor(vs + (ve - vs) * rng.random())), t - 1))
    return out


@pytest.mark.parametrize("t,n,seed", [(300, 32, 42), (100, 16, 1), (33, 32, 42), (32, 32, 5), (10, 32, 42), (1, 4, 9)])
def test_random_window_matches_reference_formula(t, n, seed):
    expected = reference_random_window(t, n, random.Random(seed))
    assert random_window_indices(t, n, random.Random(seed)) == expected


def test_random_window_one_per_window():
    t, n = 320, 32
    idx = random_window_indices(t, n, random.Random(42))
    w = t / n
    for i, fi in enumerate(idx):
        assert int(i * w) <= fi < max(min(int((i + 1) * w), t), int(i * w) + 1)


# ---------- dispatch + sampler object ----------

def test_sample_indices_dispatch_and_errors():
    assert sample_indices("uniform", 10, 4) == [0, 3, 6, 9]
    with pytest.raises(ValueError):
        sample_indices("bogus", 10, 4)
    with pytest.raises(ValueError):
        sample_indices("uniform", 0, 4)


def test_stream_sampler_reproducible():
    s1 = FrameSampler("random", num_frames=8, seed=42)
    s2 = FrameSampler("random", num_frames=8, seed=42)
    seq1 = [s1(f"v{i}.mp4", 100) for i in range(5)]
    seq2 = [s2(f"v{i}.mp4", 100) for i in range(5)]
    assert seq1 == seq2
    # Stream policy: consumption order matters — different draws per call.
    assert seq1[0] != seq1[1] or seq1[1] != seq1[2]
    s1.reset()
    assert s1("v0.mp4", 100) == seq1[0]


def test_per_video_sampler_order_independent_and_cached():
    a = FrameSampler("random_window", num_frames=16, per_video_seed=True)
    b = FrameSampler("random_window", num_frames=16, per_video_seed=True)
    ia = a("/x/clip1.mp4", 200)
    _ = b("/other/clip0.mp4", 77)  # different consumption order
    ib = b("/y/clip1.mp4", 200)  # same basename → same seed → same indices
    assert ia == ib
    assert a("/x/clip1.mp4", 200) is not None
    assert "/x/clip1.mp4" in a.cached_indices
    # Cache returns identical list even if total_frames were to change.
    assert a("/x/clip1.mp4", 999) == ia


def test_stable_video_seed_range_and_determinism():
    s = stable_video_seed("/a/b/video_01.mp4")
    assert 0 <= s < 10_000_000
    assert s == stable_video_seed("/different/dir/video_01.mp4")
    assert s != stable_video_seed("/a/b/video_02.mp4")


def test_uniform_sampler_ignores_rng_state():
    s = FrameSampler("uniform", num_frames=8)
    assert s("v.mp4", 100) == s("v.mp4", 100) == uniform_indices(100, 8)
