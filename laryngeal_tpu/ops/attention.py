"""Attention ops — single entry point for all backbones.

All transformer backbones (ViViT joint space-time, TimeSformer divided
space-time, Swin3D windowed) funnel their attention through
``dot_product_attention`` so the implementation can be swapped globally:

- ``xla``: ``jax.nn.dot_product_attention`` — XLA fuses QK^T->softmax->PV into
  an MXU-friendly schedule; the right default for the short sequences here
  (ViViT 3137 tokens, TimeSformer <=1576, Swin windows of 392).
- ``pallas``: fused flash-attention kernel (ops/flash_attention.py) for long
  sequences / memory-bound regimes. Falls back to xla when unavailable or
  when shapes don't meet the kernel's tiling constraints.

Layout: (batch, seq, heads, head_dim) everywhere ("BTNH").
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = os.environ.get("LARYNGEAL_ATTN_IMPL")  # None => auto


def set_attention_impl(impl: str) -> None:
    """Globally select 'xla' or 'pallas' (overrides auto-detection)."""
    global _IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"Unknown attention impl {impl!r}")
    _IMPL = impl


def get_attention_impl() -> str:
    """Resolved impl: env/explicit override, else pallas on TPU, xla elsewhere.

    Measured on v5e for the ViViT-B shape (B8 N3137 H12 D64, bf16): the
    Pallas flash kernel runs ~6.0 ms/attention vs ~10.9 ms for the XLA path
    (1.8x); on CPU the kernel only exists in interpret mode, so xla wins."""
    if _IMPL is not None:
        return _IMPL
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Scaled dot-product attention over (B, N, H, D) tensors.

    bias: optional additive logits bias broadcastable to (B, H, Nq, Nk)
    (used by Swin3D's relative position bias + shift masks).
    """
    impl = impl or get_attention_impl()
    if impl == "pallas" and q.shape[-1] <= 128:
        from .flash_attention import flash_attention

        # Clamp blocks to the (128-aligned) sequence length so short
        # sequences (TimeSformer N=197/T=32, Swin windows N=392) don't pad
        # out to 512.
        n = max(q.shape[1], k.shape[1])
        block = min(512, -(-n // 128) * 128)
        return flash_attention(q, k, v, bias, block, block)
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


def attention_reference(q, k, v, bias=None):
    """Unfused einsum reference used in kernel tests."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
