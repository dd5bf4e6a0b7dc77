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
    # Space-to-depth stem (MLPerf-style): the RGB stem conv fills 3 of the
    # MXU's 128 contraction lanes and was measured at 2.9% of peak — 58% of
    # the whole forward (BASELINE.md round-3 ablation). Decomposing the
    # input into 2x2 spatial phases (C 3->12) turns the 7x7/s2 conv into an
    # exactly-equivalent 4x4/s1 conv via pure kernel rearrangement; the
    # stored `stem_conv/kernel` param keeps the reference (3,7,7,3,64)
    # layout so checkpoints and torch converters are untouched.
    stem_s2d: bool = True
    # Pack adjacent W outputs into 128 channels (see _StemConv docstring).
    # Exact, and the isolated conv measures 1.15x faster (9.61 -> 8.39 ms)
    # — but WHOLE-MODEL it loses badly (fwd 35.9 -> 57.0 ms, train 138 ->
    # 156 ms on v5e): the (W/2,128)->(W,64) un-interleave forces a lane
    # relayout of the 411 MB stem output that the isolated A/B's context
    # hid. Default OFF; path kept + equivalence-tested as the recorded
    # negative result (don't retry).
    stem_pair: bool = False


class _StemConv(nn.Module):
    """The stem Conv3D 64x(3,7,7)/s(1,2,2)/p(1,3,3), param-compatible with
    ``nn.Conv`` (kernel shape (3,7,7,3,64) at the same path), computed either
    directly or via the exact space-to-depth rewrite.

    Space-to-depth derivation (per spatial axis; temporal axis untouched):
    the original output is ``y[p] = sum_k x[2p-3+k] w[k]`` (stride 2, pad 3).
    Splitting x by parity ``x[2m+e]`` gives ``k = 2(m-p)+3+e``; with conv
    offset ``d = j-2`` (kernel 4, pad (2,1), stride 1) the phase-e kernel is
    ``K[j,e] = w[2j-1+e]`` with w[-1] := 0 — i.e. pad w from 7 to 8 taps on
    the left and reshape (8,)->(4,2). Identical MACs, reassociated; the MXU
    contraction grows from C=3 to C=12 lanes (+ the 4x4 taps XLA folds in).

    Output-pair packing (``pair``): the 64 output channels use half the
    MXU's 128 output lanes, so adjacent W outputs ``y[..,2r]``/``y[..,2r+1]``
    are additionally stacked into 128 channels — the 4-tap W window
    becomes a 5-tap stride-2 window with ``K5[j5, e-block] = w[j5-e]`` for
    ``0 <= j5-e < 4`` (zeros elsewhere): 1.25x MACs at 2x lane utilization.
    Exact (pure reindexing + zero taps); the isolated conv measures 1.15x
    faster (9.61 -> 8.39 ms on v5e) but the whole model REGRESSES (see
    ResNet3DConfig.stem_pair) — the un-interleave reshape costs a lane
    relayout downstream. Kept as a measured negative result.
    """

    dtype: Any = jnp.float32
    s2d: bool = True
    pair: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 7, 7, 3, 64))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not self.s2d:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=(1, 2, 2),
                padding=[(1, 1), (3, 3), (3, 3)], dimension_numbers=dn)
        b, t, h, w, c = x.shape
        # Input phases: (..., H, W, C) -> (..., H/2, W/2, (eh, ew, c)).
        xs = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            b, t, h // 2, w // 2, 4 * c)
        # Kernel: pad 7->8 on the left of each spatial axis, split taps into
        # (position j, phase e), and align channel order to (eh, ew, c).
        kr = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        kr = kr.reshape(3, 4, 2, 4, 2, c, 64)          # (kt, jh, eh, jw, ew, c, o)
        kr = kr.transpose(0, 1, 3, 2, 4, 5, 6).reshape(3, 4, 4, 4 * c, 64)
        dn_args = (("NDHWC", "DHWIO", "NDHWC"),)
        if not (self.pair and (w // 2) % 2 == 0):
            dn = jax.lax.conv_dimension_numbers(xs.shape, kr.shape, *dn_args)
            return jax.lax.conv_general_dilated(
                xs, kr, window_strides=(1, 1, 1),
                padding=[(1, 1), (2, 1), (2, 1)], dimension_numbers=dn)
        kp = jnp.zeros((3, 4, 5, 4 * c, 2, 64), kr.dtype)
        for e in range(2):
            for j5 in range(5):
                if 0 <= j5 - e < 4:
                    kp = kp.at[:, :, j5, :, e, :].set(kr[:, :, j5 - e])
        kp = kp.reshape(3, 4, 5, 4 * c, 128)
        dn = jax.lax.conv_dimension_numbers(xs.shape, kp.shape, *dn_args)
        y = jax.lax.conv_general_dilated(
            xs, kp, window_strides=(1, 1, 2),
            padding=[(1, 1), (2, 1), (2, 2)], dimension_numbers=dn)
        bb, tm, hp, wq, _ = y.shape
        return y.reshape(bb, tm, hp, wq * 2, 64)


class ResNet3D(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logits (B, num_classes)."""

    config: ResNet3DConfig = ResNet3DConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        use_s2d = (cfg.stem_s2d and x.shape[2] % 2 == 0
                   and x.shape[3] % 2 == 0)
        x = _StemConv(dtype=cfg.dtype, s2d=use_s2d, pair=cfg.stem_pair,
                      name="stem_conv")(x)
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
