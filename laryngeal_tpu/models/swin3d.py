"""Video Swin Transformer 3D (tiny/small/base) — Flax.

Parity target: ``videoswintransformer/swin_video_classifier/models/swin3d.py:7-53``
(torchvision ``swin3d_t/s/b`` with the classification head replaced by
``nn.Linear(in, num_classes)``). Architecture per the Video Swin paper and
torchvision's implementation:

- PatchEmbed3d: Conv3d kernel=stride=(2,4,4) + LayerNorm;
- 4 stages of SwinTransformerBlock3d, window (8,7,7), alternating shift
  (0,0,0) / (4,3,3); PatchMerging (2x2 spatial concat -> LN -> Linear 4C->2C,
  no bias) between stages;
- per-window MHA with learned relative-position-bias table and shifted-window
  region masks; pre-LN blocks with MLP ratio 4 (exact gelu), stochastic depth
  linearly scaled across blocks (train only);
- head: LayerNorm -> global average over (T,H,W) -> Linear.

Variants: tiny (96, depths 2-2-6-2, heads 3-6-12-24), small (96, 2-2-18-2,
same heads), base (128, 2-2-18-2, heads 4-8-16-32).

TPU-native notes: window partition/merge are reshapes+transposes (free for
XLA); shifts are ``jnp.roll``; the relative-position index and shift masks
are compile-time numpy constants (shapes are static under jit), so the whole
stage lowers to dense batched MHA over (B*num_windows, 392, C) — MXU-sized
matmuls — routed through ops.attention's XLA/Pallas switch. Window sizes
adapt (and shifts zero out) when an input dim is smaller than the window,
matching the torch behavior.
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import window_attention
from .layers import gelu_exact


def adjust_window(size_dhw, window, shift):
    """Clamp window to input size; zero shift on clamped dims (torch
    get_window_size behavior)."""
    win, sh = list(window), list(shift)
    for i in range(3):
        if size_dhw[i] <= window[i]:
            win[i] = size_dhw[i]
            sh[i] = 0
    return tuple(win), tuple(sh)


def relative_position_index(window, full_window=None) -> np.ndarray:
    """(N, N) linearized relative-coordinate index (torchvision layout).

    ``full_window`` sets the table's coordinate strides; when the runtime
    window is clamped below the configured one (small inputs), indices still
    address the FULL-window bias table — params stay resolution-independent,
    matching torchvision (which always sizes the table by the config window).
    """
    wt, wh, ww = window
    ft, fh, fw = full_window or window
    coords = np.stack(
        np.meshgrid(np.arange(wt), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]  # (3, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += ft - 1
    rel[:, :, 1] += fh - 1
    rel[:, :, 2] += fw - 1
    rel[:, :, 0] *= (2 * fh - 1) * (2 * fw - 1)
    rel[:, :, 1] *= 2 * fw - 1
    return rel.sum(-1)


def shift_region_ids(padded_dhw, window, shift) -> np.ndarray:
    """(num_windows, N) int32 region labels for shifted-window masking.

    Two window positions may attend to each other iff their labels match;
    the additive -100 mask is derived from these (in-kernel on the Pallas
    path — the labels are what crosses the HBM boundary, N ints per window
    instead of N^2 floats)."""
    tp, hp, wp = padded_dhw
    img = np.zeros((tp, hp, wp), dtype=np.int32)
    cnt = 0
    segs = []
    for dim, (w, s) in zip((tp, hp, wp), zip(window, shift)):
        if s == 0:
            segs.append([slice(0, dim)])
        else:
            segs.append([slice(0, dim - w), slice(dim - w, dim - s), slice(dim - s, dim)])
    for st, sh, sw in itertools.product(*segs):
        img[st, sh, sw] = cnt
        cnt += 1
    wt, wh, ww = window
    wins = img.reshape(tp // wt, wt, hp // wh, wh, wp // ww, ww)
    return wins.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wt * wh * ww)


def shift_attention_mask(padded_dhw, window, shift) -> np.ndarray:
    """(num_windows, N, N) additive mask (-100 across shifted-region
    boundaries) — the materialized form of ``shift_region_ids`` (XLA path
    and tests)."""
    wins = shift_region_ids(padded_dhw, window, shift)
    return (wins[:, None, :] != wins[:, :, None]).astype(np.float32) * -100.0


def window_partition(x, window):
    b, t, h, w, c = x.shape
    wt, wh, ww = window
    x = x.reshape(b, t // wt, wt, h // wh, wh, w // ww, ww, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(-1, wt * wh * ww, c)


def window_merge(x, window, dims, batch):
    t, h, w = dims
    wt, wh, ww = window
    c = x.shape[-1]
    x = x.reshape(batch, t // wt, h // wh, w // ww, wt, wh, ww, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(batch, t, h, w, c)


class WindowAttention3D(nn.Module):
    dim: int
    window: Tuple[int, int, int]       # runtime (possibly clamped) window
    num_heads: int
    full_window: Tuple[int, int, int] = None  # config window; sizes the table
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, region_id=None):
        """x: (B*nW, N, C); region_id: (nW, N) int32 numpy array (shifted
        blocks) or None. The relative-position bias stays factored as
        (H, N, N) + region labels all the way into the attention op — the
        (B*nW, H, N, N) broadcast of round 1 is never materialized."""
        bnw, n, c = x.shape
        head_dim = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bnw, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        full = self.full_window or self.window
        ft, fh, fw = full
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * ft - 1) * (2 * fh - 1) * (2 * fw - 1), self.num_heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window, full).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads).transpose(2, 0, 1)
        from jax.ad_checkpoint import checkpoint_name

        out = checkpoint_name(
            window_attention(q, k, v, bias, region_id=region_id), "attn_out")
        out = out.reshape(bnw, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class DropPath(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Tuple[int, int, int] = (8, 7, 7)
    shift: Tuple[int, int, int] = (0, 0, 0)
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        window, shift = adjust_window((t, h, w), self.window, self.shift)
        wt, wh, ww = window

        shortcut = x
        hx = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)

        # Pad to window multiples.
        pt = (wt - t % wt) % wt
        ph = (wh - h % wh) % wh
        pw = (ww - w % ww) % ww
        hx = jnp.pad(hx, ((0, 0), (0, pt), (0, ph), (0, pw), (0, 0)))
        tp, hp, wp = t + pt, h + ph, w + pw

        if any(shift):
            hx = jnp.roll(hx, shift=(-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            region_id = shift_region_ids((tp, hp, wp), window, shift)
        else:
            region_id = None

        wins = window_partition(hx, window)
        wins = WindowAttention3D(self.dim, window, self.num_heads,
                                 full_window=self.window,
                                 dtype=self.dtype, name="attn")(wins, region_id)
        hx = window_merge(wins, window, (tp, hp, wp), b)

        if any(shift):
            hx = jnp.roll(hx, shift=shift, axis=(1, 2, 3))
        hx = hx[:, :t, :h, :w]

        x = shortcut + DropPath(self.drop_path, name="drop_path1")(hx, train)

        hx = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        hx = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(hx)
        hx = gelu_exact(hx)
        hx = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(hx)
        return x + DropPath(self.drop_path, name="drop_path2")(hx, train)


class PatchMerging(nn.Module):
    dim: int  # input channel count
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


@dataclasses.dataclass(frozen=True)
class Swin3DConfig:
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Tuple[int, int, int] = (8, 7, 7)
    patch_size: Tuple[int, int, int] = (2, 4, 4)
    mlp_ratio: float = 4.0
    num_classes: int = 2
    stochastic_depth: float = 0.1
    dtype: Any = jnp.float32
    remat: bool = False  # jax.checkpoint per block (memory <-> FLOPs)


SWIN3D_VARIANTS = {
    "tiny": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "small": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "base": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    # reference also exposes swin3d_b IN22K weights — same architecture as base
    "base_in22k": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
}


class SwinTransformer3D(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logits (B, num_classes)."""

    config: Swin3DConfig = Swin3DConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        x = nn.Conv(cfg.embed_dim, kernel_size=cfg.patch_size, strides=cfg.patch_size,
                    padding="VALID", dtype=cfg.dtype, name="patch_embed_proj")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)

        total_blocks = sum(cfg.depths)
        block_id = 0
        dim = cfg.embed_dim
        # `train` must stay a static argument under remat: DropPath branches
        # on it in Python. flax argnums count self at 0, so train is 2 —
        # and it must be passed POSITIONALLY (kwargs stay traced).
        block_cls = (
            nn.remat(SwinBlock3D, static_argnums=(2,),
                     policy=jax.checkpoint_policies.save_only_these_names(
                         "attn_out"))
            if cfg.remat else SwinBlock3D)
        for stage, depth in enumerate(cfg.depths):
            for i in range(depth):
                sd = cfg.stochastic_depth * block_id / max(total_blocks - 1, 1)
                shift = tuple(0 if i % 2 == 0 else wsz // 2 for wsz in cfg.window)
                # train passed positionally: remat's static_argnums can only
                # mark positional args static (kwargs stay traced).
                x = block_cls(
                    dim, cfg.num_heads[stage], window=cfg.window, shift=shift,
                    mlp_ratio=cfg.mlp_ratio, drop_path=sd, dtype=cfg.dtype,
                    name=f"stage{stage + 1}_block{i}",
                )(x, train)
                block_id += 1
            if stage < len(cfg.depths) - 1:
                x = PatchMerging(dim, dtype=cfg.dtype, name=f"merge{stage + 1}")(x)
                dim *= 2

        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        x = jnp.mean(x, axis=(1, 2, 3))
        return nn.Dense(cfg.num_classes, name="head")(x).astype(jnp.float32)


def create_swin3d(model_size: str = "tiny", num_classes: int = 2,
                  dtype=jnp.float32, **kwargs) -> SwinTransformer3D:
    """Factory matching the reference's --model_size surface
    (videoswintransformer/main.py:41-45)."""
    if model_size not in SWIN3D_VARIANTS:
        raise ValueError(f"Unknown swin3d size {model_size!r}; "
                         f"expected one of {sorted(SWIN3D_VARIANTS)}")
    # Explicit kwargs (e.g. from checkpoint-pinned model_kwargs) override
    # the variant preset.
    variant = dict(SWIN3D_VARIANTS[model_size])
    variant.update(kwargs)
    cfg = Swin3DConfig(num_classes=num_classes, dtype=dtype, **variant)
    return SwinTransformer3D(cfg)
