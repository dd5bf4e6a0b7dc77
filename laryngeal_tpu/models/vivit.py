"""ViViT-B — joint space-time attention video transformer (Flax).

Architectural parity with HF ``VivitForVideoClassification`` (the model the
reference trains: ``vivit_transformer/vivit_classifier/models/vivit_model.py:4-52``
loading ``google/vivit-b-16x2-kinetics400``): tubelet Conv3d embedding
(2x16x16), CLS token + learned position embeddings, 12 pre-LN ViT layers
(gelu_fast MLP), final LayerNorm, classifier on the CLS token.

TPU-native deltas vs the torch graph:
- channels-last (B,T,H,W,C) input; the tubelet conv is a single XLA conv3d
  that lowers to MXU matmuls (a (2,16,16) stride == kernel conv is exactly a
  patch-matmul); see ops/tubelet.py for the explicit Pallas/matmul variant.
- attention flows through ops.attention (swap XLA <-> Pallas globally).
- whole forward jits into one graph with preprocessing fused in front.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import TransformerBlock, gelu_fast


@dataclasses.dataclass(frozen=True)
class VivitConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    num_frames: int = 32
    tubelet_size: Tuple[int, int, int] = (2, 16, 16)
    num_classes: int = 2
    layer_norm_eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32
    # Rematerialize each block in the backward pass (jax.checkpoint):
    # trades ~30% more FLOPs for O(layers) less activation HBM, the standard
    # lever for bigger batches on a 16 GB chip.
    remat: bool = False

    @property
    def num_patches(self) -> int:
        t, ph, pw = self.tubelet_size
        return (self.num_frames // t) * (self.image_size // ph) * (self.image_size // pw)


class VivitEmbeddings(nn.Module):
    config: VivitConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array) -> jax.Array:
        cfg = self.config
        b = pixel_values.shape[0]
        # Tubelet embedding: conv3d kernel==stride==tubelet over (T,H,W).
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=cfg.tubelet_size,
            strides=cfg.tubelet_size,
            padding="VALID",
            dtype=cfg.dtype,
            name="projection",
        )(pixel_values)
        # (B, T', H', W', D) -> (B, N, D), token order t-major (HF flatten(2)).
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, cfg.hidden_size), jnp.float32
        )
        x = jnp.concatenate([jnp.tile(cls.astype(x.dtype), (b, 1, 1)), x], axis=1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(0.02),
            (1, cfg.num_patches + 1, cfg.hidden_size),
            jnp.float32,
        )
        return x + pos.astype(x.dtype)


class VivitForVideoClassification(nn.Module):
    """pixel_values (B,T,H,W,C) float32 -> logits (B, num_classes)."""

    config: VivitConfig

    @nn.compact
    def __call__(self, pixel_values: jax.Array, train: bool = False) -> jax.Array:
        from ..parallel.sp import (
            anchor_tokens_replicated, constrain_tokens, pad_tokens,
            padded_key_bias)

        cfg = self.config
        # Sequence parallelism (parallel/sp.py): pad the token axis to a
        # seq-mesh multiple (N = 3137 is prime) with the padded keys masked
        # out of every attention, then pin (data, seq) sharding per block —
        # GSPMD keeps LN/MLP token-sharded and all-gathers k/v for
        # attention. All of it no-ops single-chip.
        x = anchor_tokens_replicated(
            VivitEmbeddings(cfg, name="embeddings")(pixel_values))
        n_real = x.shape[1]
        x = constrain_tokens(pad_tokens(x))
        sp_bias = padded_key_bias(x.shape[1], n_real)
        # Selective remat: save attention outputs so the remat pass skips
        # the N^2 flash forward (its custom_vjp re-derives softmax from
        # q/k/v residuals anyway); only dense glue is recomputed.
        block_cls = (
            nn.remat(TransformerBlock,
                     policy=jax.checkpoint_policies.save_only_these_names(
                         "attn_out"))
            if cfg.remat else TransformerBlock)
        for i in range(cfg.num_layers):
            x = constrain_tokens(block_cls(
                cfg.hidden_size,
                cfg.num_heads,
                cfg.intermediate_size,
                act=gelu_fast,
                layer_norm_eps=cfg.layer_norm_eps,
                dtype=cfg.dtype,
                name=f"layer_{i}",
            )(x, sp_bias))
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(x)
        cls = x[:, 0]
        return nn.Dense(cfg.num_classes, name="classifier")(cls).astype(jnp.float32)


def create_vivit(
    num_classes: int = 2,
    num_frames: int = 32,
    image_size: int = 224,
    dtype=jnp.float32,
    **kwargs,
) -> VivitForVideoClassification:
    cfg = VivitConfig(
        num_classes=num_classes, num_frames=num_frames, image_size=image_size,
        dtype=dtype, **kwargs,
    )
    return VivitForVideoClassification(cfg)
