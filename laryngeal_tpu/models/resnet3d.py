"""3D-ResNet50 (slow pathway) video classifier (Flax).

Parity target: ``resnet50-3d-video/video_classifier/models/resnet3d.py:4-49``
(pytorchvideo ``create_resnet`` with model_depth=50):

- stem: Conv3d 64x(3,7,7) stride (1,2,2) pad (1,3,3) + BN + ReLU +
  MaxPool3d (1,3,3) stride (1,2,2) pad (0,1,1);
- 4 bottleneck stages, depths (3,4,6,3), inner widths (64,128,256,512),
  expansion 4; conv_a kernel (1,1,1),(1,1,1),(3,1,1),(3,1,1) per stage
  (temporal conv in stages 3-4), conv_b (1,3,3) with spatial stride
  (1,2,2,2), temporal stride 1 everywhere;
- head: AvgPool3d (4,7,7) stride (1,1,1) -> dropout 0.5 -> Linear(2048,2)
  applied position-wise -> global average (pytorchvideo ResNetBasicHead with
  head_output_with_global_average=True).

Layout: channels-last (B,T,H,W,C); all convs lower to MXU-tiled XLA convs.
pytorchvideo is not importable in this image; parity is pinned by (a) the
vendored key/shape manifest (compat/manifests.py) and (b) end-to-end logit
parity vs a plain-torch reimplementation of the create_resnet architecture
with pytorchvideo's exact state-dict layout (tests/test_resnet3d_parity.py)
— real pretrained weights load through `compat.torch_port.port_resnet3d`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(train: bool, dtype, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, name=name)


class Bottleneck3D(nn.Module):
    features: int
    temporal_kernel_a: int = 1
    spatial_stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ka = self.temporal_kernel_a
        s = self.spatial_stride
        identity = x
        out = nn.Conv(self.features, (ka, 1, 1), padding=[(ka // 2, ka // 2), (0, 0), (0, 0)],
                      use_bias=False, dtype=self.dtype, name="conv_a")(x)
        out = nn.relu(_bn(train, self.dtype, "bn_a")(out))
        out = nn.Conv(self.features, (1, 3, 3), strides=(1, s, s),
                      padding=[(0, 0), (1, 1), (1, 1)], use_bias=False,
                      dtype=self.dtype, name="conv_b")(out)
        out = nn.relu(_bn(train, self.dtype, "bn_b")(out))
        out = nn.Conv(self.features * 4, (1, 1, 1), use_bias=False,
                      dtype=self.dtype, name="conv_c")(out)
        out = _bn(train, self.dtype, "bn_c")(out)
        if self.downsample:
            identity = nn.Conv(self.features * 4, (1, 1, 1), strides=(1, s, s),
                               use_bias=False, dtype=self.dtype, name="shortcut_conv")(x)
            identity = _bn(train, self.dtype, "shortcut_bn")(identity)
        return nn.relu(out + identity)


@dataclasses.dataclass(frozen=True)
class ResNet3DConfig:
    num_classes: int = 2
    dropout: float = 0.5
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    stage_temporal_kernel_a: Sequence[int] = (1, 1, 3, 3)
    stage_spatial_stride: Sequence[int] = (1, 2, 2, 2)
    head_pool_kernel: Tuple[int, int, int] = (4, 7, 7)
    dtype: Any = jnp.float32


class ResNet3D(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logits (B, num_classes)."""

    config: ResNet3DConfig = ResNet3DConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = nn.Conv(64, (3, 7, 7), strides=(1, 2, 2),
                    padding=[(1, 1), (3, 3), (3, 3)], use_bias=False,
                    dtype=cfg.dtype, name="stem_conv")(x)
        x = nn.relu(_bn(train, cfg.dtype, "stem_bn")(x))
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2),
                        padding=[(0, 0), (1, 1), (1, 1)])

        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(cfg.stage_sizes, widths)):
            for i in range(blocks):
                stride = cfg.stage_spatial_stride[stage] if i == 0 else 1
                x = Bottleneck3D(
                    w,
                    temporal_kernel_a=cfg.stage_temporal_kernel_a[stage],
                    spatial_stride=stride,
                    downsample=(i == 0),
                    dtype=cfg.dtype,
                    name=f"stage{stage + 1}_{i}",
                )(x, train=train)

        # Head (pytorchvideo ResNetBasicHead): AvgPool3d(kernel, stride 1),
        # dropout, position-wise projection, global average.
        kt, kh, kw = cfg.head_pool_kernel
        kt = min(kt, x.shape[1])
        kh = min(kh, x.shape[2])
        kw = min(kw, x.shape[3])
        x = nn.avg_pool(x, (kt, kh, kw), strides=(1, 1, 1))
        if train and cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout, deterministic=False)(x)
        x = nn.Dense(cfg.num_classes, name="proj")(x)
        return jnp.mean(x, axis=(1, 2, 3)).astype(jnp.float32)


def create_resnet3d(num_classes: int = 2, dropout: float = 0.5,
                    dtype=jnp.float32, **kwargs) -> ResNet3D:
    import dataclasses as _dc

    fields = {f.name for f in _dc.fields(ResNet3DConfig)}
    cfg_kwargs = {k: v for k, v in kwargs.items() if k in fields}
    return ResNet3D(ResNet3DConfig(num_classes=num_classes, dropout=dropout,
                                   dtype=dtype, **cfg_kwargs))
