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
    # "flat": HF-parity layout — the (B, 1+n*t, D) token sequence is carried
    # through every layer and the spatial block materializes two
    # (B,N,T,D)<->(B,T,N,D) transposes + a cls concat per layer.
    # "nt": transpose-free probe layout — (cls (B,1,D), patches (B,N,T,D))
    # carried as a pair; the temporal split is a free reshape and the
    # spatial block runs batched einsum attention with the cls row fused as
    # an extra score column, so NO transpose is ever materialized.
    # Identical parameter tree (checkpoints interchange); numerics pinned
    # vs "flat" in tests/test_timesformer_layout.py. Single-chip/dp only —
    # sp's token constraints assume the flat sequence.
    layout: str = "flat"

    def __post_init__(self):
        if self.layout not in ("flat", "nt"):
            raise ValueError(f"layout must be 'flat' or 'nt', "
                             f"got {self.layout!r}")

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


class DividedSpatialAttention(nn.Module):
    """Per-frame spatial attention in the transpose-free "nt" layout.

    Parameter-compatible with ``FusedQKVAttention`` (same "qkv"/"out"
    Dense submodules) but operates directly on the n-major 4-D patches
    (B, N, T, D) plus the shared cls vector (B, 1, D): the cls token rides
    as one extra score column/row per frame (einsum-fused), so the layer
    never materializes the (B,N,T,D)->(B*T,1+N,D) transpose+concat the flat
    layout pays twice per layer (round-3 VERDICT #7 probe — the flat
    spatial block measured 106.7 ms of which only ~4.5 ms/layer was the
    attention core)."""

    hidden_size: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cls: jax.Array, patches: jax.Array):
        b, n, t, d = patches.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * self.hidden_size, dtype=self.dtype, name="qkv")
        out = nn.Dense(self.hidden_size, dtype=self.dtype, name="out")

        qkv_p = qkv(patches).reshape(b, n, t, 3, h, hd)
        q_p, k_p, v_p = (qkv_p[:, :, :, 0], qkv_p[:, :, :, 1],
                         qkv_p[:, :, :, 2])  # (B,N,T,H,hd)
        qkv_c = qkv(cls).reshape(b, 3, h, hd)
        q_c, k_c, v_c = qkv_c[:, 0], qkv_c[:, 1], qkv_c[:, 2]  # (B,H,hd)
        scale = jnp.asarray(hd ** -0.5, patches.dtype)

        # Patch queries: per-frame scores over [cls | same-frame patches].
        s_pp = jnp.einsum("bnthd,bmthd->bthnm", q_p, k_p) * scale
        s_pc = jnp.einsum("bnthd,bhd->bthn", q_p, k_c) * scale
        w = jax.nn.softmax(
            jnp.concatenate([s_pc[..., None], s_pp], axis=-1), axis=-1)
        ctx_p = (jnp.einsum("bthn,bhd->bnthd", w[..., 0], v_c)
                 + jnp.einsum("bthnm,bmthd->bnthd", w[..., 1:], v_p))

        # cls queries (identical per frame pre-softmax; frame-dependent via
        # the per-frame key set).
        s_cc = jnp.einsum("bhd,bhd->bh", q_c, k_c) * scale
        s_cp = jnp.einsum("bhd,bnthd->bthn", q_c, k_p) * scale
        wc = jax.nn.softmax(
            jnp.concatenate(
                [jnp.broadcast_to(s_cc[:, None, :, None], (b, t, h, 1)),
                 s_cp], axis=-1), axis=-1)
        ctx_c = (jnp.einsum("bth,bhd->bthd", wc[..., 0], v_c)
                 + jnp.einsum("bthn,bnthd->bthd", wc[..., 1:], v_p))

        # Same remat-policy names as FusedQKVAttention: saving the contexts
        # lets the remat pass skip both softmax forwards.
        ctx_p = checkpoint_name(ctx_p, "attn_out")
        ctx_c = checkpoint_name(ctx_c, "attn_out")
        return out(ctx_c.reshape(b, t, d)), out(ctx_p.reshape(b, n, t, d))


class TimesformerLayerNT(nn.Module):
    """Transpose-free "nt"-layout TimeSformer layer.

    Carries (cls (B,1,D), patches (B,N,T,D)) — n-major, so the temporal
    split (B*N, T, D) is a FREE reshape and the spatial block runs through
    :class:`DividedSpatialAttention` with zero transposes. Parameter tree
    identical to :class:`TimesformerLayer` (module names match; Dense and
    LayerNorm act on the trailing dim regardless of rank), so checkpoints
    interchange between layouts."""

    config: TimesformerConfig

    @nn.compact
    def __call__(self, x) -> tuple:
        cfg = self.config
        cls, patches = x
        b, n, t, d = patches.shape

        # Temporal attention: (B, N, T, D) -> (B*N, T, D) is row-major-free.
        pt = patches.reshape(b * n, t, d)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="temporal_layernorm")(pt)
        h = FusedQKVAttention(cfg.hidden_size, cfg.num_heads, dtype=cfg.dtype,
                              name="temporal_attention")(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype,
                     name="temporal_dense")(h.reshape(b, n, t, d))
        patches = patches + h

        # Spatial attention (per frame, cls fused as an extra token).
        ln_before = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                 name="layernorm_before")
        out_c, out_p = DividedSpatialAttention(
            cfg.hidden_size, cfg.num_heads, dtype=cfg.dtype,
            name="attention")(ln_before(cls), ln_before(patches))
        cls = cls + out_c.mean(axis=1, keepdims=True)
        patches = patches + out_p

        # MLP (shared modules across cls/patches — per-token math).
        ln_after = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                name="layernorm_after")
        fc1 = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="mlp_fc1")
        fc2 = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_fc2")

        def mlp(v):
            return fc2(gelu_exact(fc1(ln_after(v))))

        return cls + mlp(cls), patches + mlp(patches)


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
        base = TimesformerLayerNT if cfg.layout == "nt" else TimesformerLayer
        layer_cls = (
            nn.remat(base,
                     policy=jax.checkpoint_policies.save_only_these_names(
                         "attn_out"))
            if cfg.remat else base)
        if cfg.layout == "nt":
            # Flat token order is spatial-major, so the 4-D split is free.
            b, total, d = x.shape
            n = (total - 1) // cfg.num_frames
            state = (x[:, :1], x[:, 1:].reshape(b, n, cfg.num_frames, d))
            for i in range(cfg.num_layers):
                state = layer_cls(cfg, name=f"layer_{i}")(state)
            cls = state[0]
            cls = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layernorm")(cls)
            return nn.Dense(cfg.num_classes, name="classifier")(
                cls[:, 0]).astype(jnp.float32)
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
