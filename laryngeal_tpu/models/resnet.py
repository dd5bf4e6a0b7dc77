"""ResNet50 (2D) backbone + LSTM video classifier (Flax).

Parity target: ``resnet50-2d-lstm/src/models/model.py:10-59`` —
torchvision ResNet50 (ImageNet weights, fc stripped, frozen) -> per-frame
2048-d features -> 2-layer LSTM(hidden 256, dropout 0.5 between layers) ->
classifier Linear(256,64) -> ReLU -> Dropout(0.5) -> Linear(64,1).

TPU-native notes:
- frames fold into the batch: (B,T,H,W,C) -> (B*T,H,W,C) so every conv runs
  as one large MXU-friendly batch; the LSTM is a ``lax.scan`` over T with one
  fused (4H) gate matmul per step, gate order (i,f,g,o) matching torch for
  mechanical weight porting.
- BatchNorm uses running stats collections ('batch_stats'); the reference
  freezes backbone *params* but still updates BN running stats in train mode
  (model.train() with requires_grad=False) — we reproduce that: the train
  step keeps batch_stats mutable while the optimizer masks backbone params.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class Bottleneck(nn.Module):
    """torchvision Bottleneck: 1x1 -> 3x3(stride) -> 1x1(x4) with BN+ReLU."""

    features: int  # inner width
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )
        conv = lambda f, k, s, name, pad=0: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(pad, pad)] * 2, use_bias=False,
            dtype=self.dtype, name=name,
        )
        identity = x
        out = nn.relu(norm("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        out = nn.relu(norm("bn2")(conv(self.features, 3, self.stride, "conv2", pad=1)(out)))
        out = norm("bn3")(conv(self.features * 4, 1, 1, "conv3")(out))
        if self.downsample:
            identity = norm("downsample_bn")(
                conv(self.features * 4, 1, self.stride, "downsample_conv")(x)
            )
        return nn.relu(out + identity)


class _StemConv2D(nn.Module):
    """torchvision conv1 (64x7x7/s2/p3), param-compatible with ``nn.Conv``
    (kernel (7,7,3,64) at the same path), computed via the exact
    space-to-depth rewrite when the input is even-sized: 2x2 phase
    decomposition (C 3->12) turns it into a 4x4/s1 conv by pure kernel
    rearrangement — same derivation as the 3D stem
    (models/resnet3d.py::_StemConv): per axis ``K[j,e] = w[2j-1+e]`` with
    w[-1] := 0, i.e. pad 7->8 taps on the left and reshape (8,)->(4,2).
    The RGB stem fills 3/128 MXU contraction lanes and measured 2.9% of
    peak in the 3D family — but measured on hardware the 2D rewrite is a
    small LOSS (fwd 23.53 vs 22.19 ms/batch8x32f; train 207.7 vs 213.1
    clips/s): XLA's 2D conv lowering already handles the RGB stem well, so
    the default is OFF for this family (contrast the 3D stem's 1.53x win,
    BASELINE.md round-3 ablation)."""

    dtype: Any = jnp.float32
    s2d: bool = False

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 3, 64))
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        n, h, w, c = x.shape
        if not self.s2d or h % 2 or w % 2:
            dn = jax.lax.conv_dimension_numbers(
                x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                x, kernel, window_strides=(2, 2),
                padding=[(3, 3), (3, 3)], dimension_numbers=dn)
        xs = x.reshape(n, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)
        kr = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))
        kr = kr.reshape(4, 2, 4, 2, c, 64)             # (jh, eh, jw, ew, c, o)
        kr = kr.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 4 * c, 64)
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, kr.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xs, kr, window_strides=(1, 1),
            padding=[(2, 1), (2, 1)], dimension_numbers=dn)


class ResNet50(nn.Module):
    """torchvision-layout ResNet50 trunk; returns pooled 2048-d features."""

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32
    stem_s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _StemConv2D(dtype=self.dtype, s2d=self.stem_s2d, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        widths = (64, 128, 256, 512)
        for stage, (blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for i in range(blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = Bottleneck(
                    w, stride=stride, downsample=(i == 0), dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
        return jnp.mean(x, axis=(1, 2))  # global average pool -> (N, 2048)


class LSTM(nn.Module):
    """Multi-layer LSTM matching torch nn.LSTM semantics (batch_first).

    One fused gate matmul per step; gates ordered (i, f, g, o) like torch so
    ``weight_ih_l{k}`` converts by transpose alone.
    """

    hidden_size: int
    num_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, _ = x.shape
        h_dim = self.hidden_size
        bound = 1.0 / float(h_dim) ** 0.5

        def torch_uniform(key, shape, dtype=jnp.float32):
            # torch nn.LSTM initializes ALL params (weights and biases) from
            # the symmetric U(-1/sqrt(H), 1/sqrt(H)); flax's uniform() is
            # [0, scale) which would bias gates positive at init.
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        for layer in range(self.num_layers):
            w_ih = self.param(f"w_ih_l{layer}", torch_uniform,
                              (x.shape[-1], 4 * h_dim))
            w_hh = self.param(f"w_hh_l{layer}", torch_uniform,
                              (h_dim, 4 * h_dim))
            b_ih = self.param(f"b_ih_l{layer}", torch_uniform, (4 * h_dim,))
            b_hh = self.param(f"b_hh_l{layer}", torch_uniform, (4 * h_dim,))

            # Bias sum must be cast too: f32 biases would promote the gates
            # (and hence the scan carry) to f32, crashing bf16 runs with a
            # carry-dtype mismatch against the bf16-initialized (h, c).
            x_gates = (x.astype(self.dtype) @ w_ih.astype(self.dtype)
                       + (b_ih + b_hh).astype(self.dtype))

            def step(carry, xg):
                h, c = carry
                gates = xg + h @ w_hh.astype(self.dtype)
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h = jax.nn.sigmoid(o) * jnp.tanh(c)
                return (h, c), h

            init = (jnp.zeros((b, h_dim), self.dtype), jnp.zeros((b, h_dim), self.dtype))
            _, hs = jax.lax.scan(step, init, x_gates.transpose(1, 0, 2))
            x = hs.transpose(1, 0, 2)  # (B, T, H)
            if train and self.dropout > 0 and layer < self.num_layers - 1:
                x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


@dataclasses.dataclass(frozen=True)
class ResNetLSTMConfig:
    hidden_size: int = 256
    num_layers: int = 2
    dropout: float = 0.5
    dtype: Any = jnp.float32
    # Trunk stage sizes — (3,4,6,3) is the reference ResNet50; smaller values
    # exist for cheap multichip dryruns/tests only.
    stage_sizes: Any = (3, 4, 6, 3)
    # Space-to-depth stem (see _StemConv2D): measured slightly SLOWER for
    # this family on v5e (the trunk is fwd-only and XLA's 2D lowering is
    # already good) — default OFF; the exact-equivalent path stays
    # available and tested.
    stem_s2d: bool = False


class VideoResNet50LSTM(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logit (B, 1) (BCE-with-logits head)."""

    config: ResNetLSTMConfig = ResNetLSTMConfig()

    @nn.compact
    def __call__(self, pixel_values, train: bool = False):
        cfg = self.config
        b, t, h, w, c = pixel_values.shape
        frames = pixel_values.reshape(b * t, h, w, c)
        # Backbone BN stats update in train mode even though its params are
        # frozen by the optimizer mask (reference behavior, see module doc).
        feats = ResNet50(dtype=cfg.dtype, stage_sizes=tuple(cfg.stage_sizes),
                         stem_s2d=cfg.stem_s2d,
                         name="resnet50")(frames, train=train)
        feats = feats.reshape(b, t, -1)
        seq = LSTM(cfg.hidden_size, cfg.num_layers, cfg.dropout,
                   dtype=cfg.dtype, name="lstm")(feats, train=train)
        x = seq[:, -1]
        x = nn.Dense(64, name="fc1")(x)
        x = nn.relu(x)
        if train and cfg.dropout > 0:
            x = nn.Dropout(cfg.dropout, deterministic=False)(x)
        return nn.Dense(1, name="fc2")(x).astype(jnp.float32)


def create_resnet50_lstm(hidden_size: int = 256, num_layers: int = 2,
                         dropout: float = 0.5, dtype=jnp.float32,
                         stage_sizes=(3, 4, 6, 3), stem_s2d: bool = False,
                         **_) -> VideoResNet50LSTM:
    return VideoResNet50LSTM(ResNetLSTMConfig(hidden_size, num_layers, dropout,
                                              dtype, tuple(stage_sizes),
                                              stem_s2d))


def backbone_param_mask(params) -> Any:
    """Pytree mask: True where trainable (reference freezes the ResNet trunk,
    resnet50-2d-lstm/src/models/model.py:15-17)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {k: not (k[0] == "resnet50") for k in flat}
    return flax.traverse_util.unflatten_dict(mask)
