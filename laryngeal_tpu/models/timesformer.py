"""TimeSformer-B — divided space-time attention (Flax).

Architectural parity with HF ``TimesformerForVideoClassification`` (the model
the reference trains: ``timesformer/timesformer_classifier/models/
timesformer_model.py:27-43`` loading
``facebook/timesformer-base-finetuned-k400``):

- per-frame Conv2d patch embedding (16x16), spatial position embeddings per
  frame, temporal embeddings per patch; patch tokens ordered
  **spatial-major, time-innermost** (n*T + t), cls token = cls + pos[0].
- each layer: temporal attention over the T axis per spatial location
  (projected by ``temporal_dense``, residual), then spatial attention per
  frame with the cls token attending within every frame and averaged across
  frames, then MLP. (HF modeling_timesformer.py TimesformerLayer, divided
  branch.)
- fused qkv projection (one Dense of size 3*hidden), exact gelu.

TPU-native notes: the temporal/spatial splits are pure reshapes (B*N, T, D)
and (B*T, 1+N, D) — XLA treats them as free layout changes; both attention
calls run through ops.attention so they share the Pallas/XLA switch. The
divided pattern gives two small attentions (T<=32 and N+1=197) instead of one
3k-token one — already MXU-friendly without masking tricks.

Stochastic depth (drop_path) is 0 in the reference config and omitted here.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention
from .layers import gelu_exact


@dataclasses.dataclass(frozen=True)
class TimesformerConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    num_frames: int = 8
    patch_size: int = 16
    num_classes: int = 2
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # jax.checkpoint per layer (memory <-> FLOPs)

    @property
    def num_spatial_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


class FusedQKVAttention(nn.Module):
    """MHA with a fused qkv Dense (HF TimesformerSelfAttention layout)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape
        head_dim = self.hidden_size // self.num_heads
        qkv = nn.Dense(3 * self.hidden_size, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # Named so the remat policy can SAVE attention outputs: the
        # kernels' custom_vjp recomputes softmax internally from q/k/v, so
        # re-running the attention forward during the remat pass is pure
        # waste — only the cheap dense glue needs recomputing.
        out = checkpoint_name(dot_product_attention(q, k, v), "attn_out")
        out = out.reshape(b, n, self.hidden_size)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="out")(out)


class TimesformerLayer(nn.Module):
    config: TimesformerConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..parallel.sp import constrain_tokens

        cfg = self.config
        b, total, d = x.shape
        t = cfg.num_frames
        n = (total - 1) // t  # spatial patches

        # Sequence parallelism (parallel/sp.py): the carried vector is
        # (B, 1+n*t, D) — odd because of cls — so the sharding constraints
        # pin the (B, n*t, D) *patches* instead (n*t = 196*32 = 2^7*7^2 at
        # the real geometry, divisible by any practical seq axis; cls rides
        # replicated). The (B,n*t,D)<->(B*n,t,D)<->(B*t,1+n,D) reshapes in
        # between re-shard automatically under GSPMD. No-op single-chip.
        cls, patches = x[:, :1], constrain_tokens(x[:, 1:])

        # Temporal attention: (B, N, T, D) -> (B*N, T, D).
        pt = patches.reshape(b * n, t, d)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="temporal_layernorm")(pt)
        h = FusedQKVAttention(cfg.hidden_size, cfg.num_heads, dtype=cfg.dtype,
                              name="temporal_attention")(h)
        h = h.reshape(b, n * t, d)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="temporal_dense")(h)
        patches = constrain_tokens(patches + h)

        # Spatial attention: (B, N, T, D) -> (B*T, 1+N, D) with tiled cls.
        sp = patches.reshape(b, n, t, d).transpose(0, 2, 1, 3).reshape(b * t, n, d)
        cls_tiled = jnp.repeat(cls, t, axis=0)  # (B*T, 1, D), b-major like torch
        sp = jnp.concatenate([cls_tiled, sp], axis=1)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_before")(sp)
        h = FusedQKVAttention(cfg.hidden_size, cfg.num_heads, dtype=cfg.dtype,
                              name="attention")(h)
        # cls residual: mean over frames.
        cls_res = h[:, 0].reshape(b, t, d).mean(axis=1, keepdims=True)
        patch_res = h[:, 1:].reshape(b, t, n, d).transpose(0, 2, 1, 3).reshape(b, n * t, d)

        x = jnp.concatenate([cls, patches], axis=1) + jnp.concatenate(
            [cls_res, patch_res], axis=1
        )

        # MLP.
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm_after")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="mlp_fc1")(h)
        h = gelu_exact(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_fc2")(h)
        return x + h


class TimesformerEmbeddings(nn.Module):
    config: TimesformerConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        b, t, hh, ww, c = pixel_values.shape
        frames = pixel_values.reshape(b * t, hh, ww, c)
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=cfg.dtype,
            name="projection",
        )(frames)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b * t, n, cfg.hidden_size)

        pos = self.param(
            "position_embeddings", nn.initializers.zeros,
            (1, cfg.num_spatial_patches + 1, cfg.hidden_size), jnp.float32,
        ).astype(x.dtype)
        cls_param = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        ).astype(x.dtype)
        x = x + pos[:, 1:]

        # Time embeddings over (B*N, T, D): reorder to spatial-major.
        x = x.reshape(b, t, n, cfg.hidden_size).transpose(0, 2, 1, 3)
        time = self.param(
            "time_embeddings", nn.initializers.zeros,
            (1, cfg.num_frames, cfg.hidden_size), jnp.float32,
        ).astype(x.dtype)
        x = x + time[None]
        x = x.reshape(b, n * t, cfg.hidden_size)

        # cls token (identical for every frame pre-encoder): cls + pos[0].
        cls = jnp.tile(cls_param + pos[:, :1], (b, 1, 1))
        return jnp.concatenate([cls, x], axis=1)


class TimesformerForVideoClassification(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logits (B, num_classes)."""

    config: TimesformerConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.config
        x = TimesformerEmbeddings(cfg, name="embeddings")(pixel_values)
        # Selective remat: keep the two attention outputs per layer
        # (2 x 77 MB bf16 at 32f B8 — well under the HBM freed by remat)
        # so the remat pass skips the N^2 attention forwards; measured on
        # v5e vs plain per-layer remat in BASELINE.md.
        layer_cls = (
            nn.remat(TimesformerLayer,
                     policy=jax.checkpoint_policies.save_only_these_names(
                         "attn_out"))
            if cfg.remat else TimesformerLayer)
        for i in range(cfg.num_layers):
            x = layer_cls(cfg, name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        return nn.Dense(cfg.num_classes, name="classifier")(x[:, 0]).astype(jnp.float32)


def create_timesformer(
    num_classes: int = 2, num_frames: int = 8, image_size: int = 224,
    dtype=jnp.float32, **kwargs,
) -> TimesformerForVideoClassification:
    cfg = TimesformerConfig(
        num_classes=num_classes, num_frames=num_frames, image_size=image_size,
        dtype=dtype, **kwargs,
    )
    return TimesformerForVideoClassification(cfg)
