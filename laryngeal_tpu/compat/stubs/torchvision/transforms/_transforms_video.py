"""torchvision.transforms._transforms_video stub — CenterCropVideo and
NormalizeVideo, the two symbols the swin pipelines import
(``videoswintransformer/inference.py:20-24`` and its dataset). Tensor
contract: (C, T, H, W) float video.

NormalizeVideo folds in the /255 the reference's sibling inference paths
apply explicitly (``resnet50-2d-lstm/inference.py:167``,
``resnet50-3d-video/inference.py:383``): the real torchvision class does
not rescale, and feeding 0-255 EncodedVideo output into mean-0.45 / std-
0.225 normalization is the same train/infer inconsistency documented in
the pytorchvideo-stub Normalize — the stub implements the author's intended
[0,1] semantics so both A/B sides compare the deployed pipeline.
"""

import torch


class CenterCropVideo:
    def __init__(self, crop_size):
        self.size = crop_size if isinstance(crop_size, int) else crop_size[0]

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        h, w = x.shape[-2], x.shape[-1]
        top = (h - self.size) // 2
        left = (w - self.size) // 2
        return x[..., top:top + self.size, left:left + self.size]


class NormalizeVideo:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean, dtype=torch.float32)
        self.std = torch.tensor(std, dtype=torch.float32)

    def __call__(self, x: torch.Tensor) -> torch.Tensor:
        x = x.float() / 255.0
        return (x - self.mean.view(-1, 1, 1, 1)) / self.std.view(-1, 1, 1, 1)
