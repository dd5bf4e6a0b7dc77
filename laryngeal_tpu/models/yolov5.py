"""YOLOv5 (v6.x architecture) in Flax — the glottis detector backbone.

The reference drives an *external* ultralytics/yolov5 checkout (empty
submodule mount, ``src/yolo_detector.py:10-18``) through
``DetectMultiBackend``. Here the network is TPU-native: channels-last Flax
modules (Conv-BN-SiLU, C3, SPPF, PANet neck, anchor-based Detect head with
in-graph decode), one jitted graph from letterboxed frames to decoded
(xywh, conf, cls) predictions, NMS on host (ops/nms.py).

Variants n/s/m/l/x via the standard depth/width multiples; weight porting
from an ultralytics state_dict lives in compat.torch_port.port_yolov5.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# P3/P4/P5 anchors (pixels at stride 8/16/32) — yolov5 models/yolov5*.yaml.
DEFAULT_ANCHORS = (
    ((10, 13), (16, 30), (33, 23)),
    ((30, 61), (62, 45), (59, 119)),
    ((116, 90), (156, 198), (373, 326)),
)
STRIDES = (8, 16, 32)

MULTIPLES = {
    "n": (0.33, 0.25),
    "s": (0.33, 0.50),
    "m": (0.67, 0.75),
    "l": (1.00, 1.00),
    "x": (1.33, 1.25),
}


def make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


class ConvBnSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # ultralytics autopad: p = k//2 for odd k, and the v6 stem passes
        # p=2 for its k=6 conv — (k-1)//2 covers both.
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return jax.nn.silu(x)


class Bottleneck(nn.Module):
    features: int
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnSiLU(self.features, 3, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class C3(nn.Module):
    features: int
    n: int = 1
    shortcut: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        a = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        b = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv2")(x, train)
        for i in range(self.n):
            a = Bottleneck(c_, self.shortcut, dtype=self.dtype, name=f"m{i}")(a, train)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv3")(
            jnp.concatenate([a, b], axis=-1), train)


class SPPF(nn.Module):
    features: int
    pool: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = ConvBnSiLU(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.pool // 2
        mp = lambda v: nn.max_pool(v, (self.pool, self.pool), strides=(1, 1),
                                   padding=[(p, p), (p, p)])
        y1 = mp(x)
        y2 = mp(y1)
        y3 = mp(y2)
        return ConvBnSiLU(self.features, 1, dtype=self.dtype, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train)


def upsample2x(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")


@dataclasses.dataclass(frozen=True)
class YoloV5Config:
    size: str = "s"
    num_classes: int = 1  # glottis
    anchors: Tuple = DEFAULT_ANCHORS
    dtype: Any = jnp.float32

    @property
    def depth_width(self):
        return MULTIPLES[self.size]


class YoloV5(nn.Module):
    """letterboxed image (B, H, W, 3) float32 in [0,1] ->
    decoded predictions (B, total_anchors, 5+nc): xywh in input pixels,
    objectness, class scores (all sigmoided) — ultralytics Detect layout."""

    config: YoloV5Config = YoloV5Config()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        gd, gw = cfg.depth_width
        c = lambda ch: make_divisible(ch * gw, 8)
        d = lambda n: max(round(n * gd), 1)
        dt = cfg.dtype
        x = x.astype(dt)

        # Backbone.
        x = ConvBnSiLU(c(64), 6, 2, dt, name="b0")(x, train)
        x = ConvBnSiLU(c(128), 3, 2, dt, name="b1")(x, train)
        x = C3(c(128), d(3), dtype=dt, name="b2")(x, train)
        x = ConvBnSiLU(c(256), 3, 2, dt, name="b3")(x, train)
        p3 = C3(c(256), d(6), dtype=dt, name="b4")(x, train)
        x = ConvBnSiLU(c(512), 3, 2, dt, name="b5")(p3, train)
        p4 = C3(c(512), d(9), dtype=dt, name="b6")(x, train)
        x = ConvBnSiLU(c(1024), 3, 2, dt, name="b7")(p4, train)
        x = C3(c(1024), d(3), dtype=dt, name="b8")(x, train)
        p5 = SPPF(c(1024), 5, dt, name="b9")(x, train)

        # PANet neck.
        h10 = ConvBnSiLU(c(512), 1, 1, dt, name="h10")(p5, train)
        x = jnp.concatenate([upsample2x(h10), p4], axis=-1)
        h13 = C3(c(512), d(3), shortcut=False, dtype=dt, name="h13")(x, train)
        h14 = ConvBnSiLU(c(256), 1, 1, dt, name="h14")(h13, train)
        x = jnp.concatenate([upsample2x(h14), p3], axis=-1)
        o3 = C3(c(256), d(3), shortcut=False, dtype=dt, name="h17")(x, train)
        x = ConvBnSiLU(c(256), 3, 2, dt, name="h18")(o3, train)
        x = jnp.concatenate([x, h14], axis=-1)
        o4 = C3(c(512), d(3), shortcut=False, dtype=dt, name="h20")(x, train)
        x = ConvBnSiLU(c(512), 3, 2, dt, name="h21")(o4, train)
        x = jnp.concatenate([x, h10], axis=-1)
        o5 = C3(c(1024), d(3), shortcut=False, dtype=dt, name="h23")(x, train)

        # Detect head + in-graph decode.
        nc = cfg.num_classes
        no = nc + 5
        outs = []
        for li, (feat, stride, anchors) in enumerate(
            zip((o3, o4, o5), STRIDES, cfg.anchors)
        ):
            na = len(anchors)
            b, gh, gw_, _ = feat.shape
            raw = nn.Conv(na * no, (1, 1), dtype=dt, name=f"detect{li}")(feat)
            raw = raw.reshape(b, gh, gw_, na, no).astype(jnp.float32)
            sig = jax.nn.sigmoid(raw)
            gy = jax.lax.broadcasted_iota(jnp.float32, (gh, gw_), 0)
            gx = jax.lax.broadcasted_iota(jnp.float32, (gh, gw_), 1)
            grid = jnp.stack([gx, gy], axis=-1)[None, :, :, None]  # (1,gh,gw,1,2)
            anchor = jnp.asarray(anchors, jnp.float32)[None, None, None]  # (1,1,1,na,2)
            xy = (sig[..., 0:2] * 2.0 - 0.5 + grid) * stride
            wh = (sig[..., 2:4] * 2.0) ** 2 * anchor
            out = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
            outs.append(out.reshape(b, gh * gw_ * na, no))
        return jnp.concatenate(outs, axis=1)


def create_yolov5(size: str = "s", num_classes: int = 1, dtype=jnp.float32) -> YoloV5:
    if size not in MULTIPLES:
        raise ValueError(f"Unknown yolov5 size {size!r}; expected one of {sorted(MULTIPLES)}")
    return YoloV5(YoloV5Config(size=size, num_classes=num_classes, dtype=dtype))
