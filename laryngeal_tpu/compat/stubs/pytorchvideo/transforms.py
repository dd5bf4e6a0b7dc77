"""pytorchvideo.transforms stub — the five symbols the CNN-family datasets
import (``resnet50-3d-video/video_classifier/data_config/dataset.py:7-13``,
``resnet50-2d-lstm/src/data_config/dataset.py``,
``videoswintransformer/.../data_config/dataset.py``), reimplemented in plain
torch with pytorchvideo's tensor contract: video is a float (C, T, H, W)
tensor, temporal dim -3, interpolation ``F.interpolate(mode='bilinear',
align_corners=False)`` (antialias off — the semantics our jax preprocess is
parity-tested against in tests/test_transforms.py).

Normalize semantics note: real pytorchvideo ``Normalize`` does NOT rescale
to [0,1], and the reference train pipelines pass EncodedVideo's 0-255 float
output straight into ``Normalize((0.45,...), (0.225,...))`` — but the
reference's OWN inference paths divide by 255 first
(``resnet50-2d-lstm/inference.py:167``, ``resnet50-3d-video/
inference.py:383``), i.e. [0,1] normalization is the author's intent and
the train-side /255 omission is a train/infer inconsistency the stem
BatchNorm masks. This stub implements the intended semantics (x/255 before
mean/std) so the A/B compares the pipeline the reference actually deploys.

``LARYNGEAL_STUB_DETERMINISTIC=1`` pins the Random* transforms to their
deterministic centers (scale -> (min+max)//2, crop -> center, flip -> off)
so a cross-framework training A/B can run without trying to align torch and
jax RNG streams (impossible); scripts/reference_ab.py sets it on both sides
and the report discloses it.
"""

import os

import torch
import torch.nn.functional as F


def _deterministic() -> bool:
    return os.environ.get("LARYNGEAL_STUB_DETERMINISTIC") == "1"


class ApplyTransformToKey:
    def __init__(self, key, transform):
        self.key = key
        self.transform = transform

    def __call__(self, sample: dict) -> dict:
        sample[self.key] = self.transform(sample[self.key])
        return sample


class UniformTemporalSubsample:
    """torch.linspace(0, T-1, n) indices over the temporal (-3) dim."""

    def __init__(self, num_samples: int):
        self.num_samples = num_samples

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        t = x.shape[-3]
        idx = torch.linspace(0, t - 1, self.num_samples).long()
        return torch.index_select(x, -3, idx)


def _short_side_scale(x: torch.Tensor, size: int) -> torch.Tensor:
    c, t, h, w = x.shape
    if w < h:
        new_w, new_h = size, int((float(h) / w) * size)
    else:
        new_w, new_h = int((float(w) / h) * size), size
    return F.interpolate(x, size=(new_h, new_w), mode="bilinear",
                         align_corners=False)


class ShortSideScale:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        return _short_side_scale(x, self.size)


class RandomShortSideScale:
    def __init__(self, min_size: int, max_size: int):
        self.min_size, self.max_size = min_size, max_size

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        if _deterministic():
            # Deterministic floor = min_size, chosen so the pinned train
            # transform coincides with the reference's own eval transform
            # (ShortSideScale(256) + CenterCrop) — both A/B sides then run
            # one deterministically-specified pipeline end to end.
            size = self.min_size
        else:
            size = int(torch.randint(self.min_size, self.max_size + 1, ()))
        return _short_side_scale(x, size)


class Normalize:
    """x/255 -> (x - mean) / std per channel on (C, T, H, W); see the
    module docstring for why the /255 is folded in."""

    def __init__(self, mean, std):
        self.mean = torch.tensor(mean, dtype=torch.float32)
        self.std = torch.tensor(std, dtype=torch.float32)

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        x = x.float() / 255.0
        m = self.mean.view(-1, 1, 1, 1)
        s = self.std.view(-1, 1, 1, 1)
        return (x - m) / s
