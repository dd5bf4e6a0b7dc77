"""torchvision.transforms stub (tensor path only) — see package docstring.

``LARYNGEAL_STUB_DETERMINISTIC=1`` pins the Random* transforms to their
deterministic centers (crop -> center, flip -> off), mirroring
pytorchvideo-stub behavior so cross-framework training A/Bs don't chase
unalignable RNG streams.
"""

import os

import torch


def _deterministic() -> bool:
    return os.environ.get("LARYNGEAL_STUB_DETERMINISTIC") == "1"


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


def _center_crop(x: torch.Tensor, size: int) -> torch.Tensor:
    h, w = x.shape[-2], x.shape[-1]
    top = (h - size) // 2
    left = (w - size) // 2
    return x[..., top:top + size, left:left + size]


class CenterCrop:
    def __init__(self, size):
        self.size = size if isinstance(size, int) else size[0]

    def __call__(self, x):
        return _center_crop(x, self.size)


class RandomCrop:
    def __init__(self, size):
        self.size = size if isinstance(size, int) else size[0]

    def __call__(self, x):
        if _deterministic():
            return _center_crop(x, self.size)
        h, w = x.shape[-2], x.shape[-1]
        top = int(torch.randint(0, h - self.size + 1, ()))
        left = int(torch.randint(0, w - self.size + 1, ()))
        return x[..., top:top + self.size, left:left + self.size]


class RandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, x):
        if not _deterministic() and float(torch.rand(())) < self.p:
            return torch.flip(x, dims=(-1,))
        return x
