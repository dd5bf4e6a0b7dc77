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
    (used by Swin3D's relative position bias + shift masks), or a
    ``parallel.sp.TrailingKeyMask`` — a static "keys >= n_real are padding"
    marker the flash kernel applies in-register for free.
    """
    impl = impl or get_attention_impl()
    n = max(q.shape[1], k.shape[1])
    kv_valid = None
    from ..parallel.sp import TrailingKeyMask

    if isinstance(bias, TrailingKeyMask):
        kv_valid = bias.n_real
        bias = None
    # Under sequence (token-axis) sharding the SPMD partitioner must split
    # this op q-sharded with all-gathered k/v; a Pallas kernel is an opaque
    # custom call it can only replicate, so route it through an explicit
    # shard_map (q sharded, k/v all-gathered — parallel/sp.py) and fall back
    # to the partitionable XLA path when the shapes don't shard cleanly.
    if impl == "pallas":
        from ..parallel.sp import sequence_sharding_enabled, sp_sharded_attention

        if sequence_sharding_enabled():
            if bias is None and q.shape[-1] <= 128 and n >= 512:
                out = sp_sharded_attention(q, k, v, kv_valid)
                if out is not None:
                    return out
            impl = "xla"
    # Short/mid sequences (TimeSformer divided attention) go to the batched
    # short-sequence kernel: full softmax in VMEM, a chunk of batch-heads
    # per program, and for N<128 a P=128//pow2(N) sequence-packed score
    # layout (ops/short_attention.py). Measured on v5e at the real
    # TimeSformer-B shapes (bf16, 30-iter dependence-chained harness,
    # scripts/bench_short_attn_op.py, chunk-tuned c<=12): temporal
    # (1576,32,12,64) fwd 2.76 ms vs XLA 5.05 (1.83x), fwd+bwd 3.86 vs
    # 7.26 (1.88x); spatial (256,197,12,64) fwd 4.49 vs 6.32 (1.41x),
    # fwd+bwd 5.85 vs 10.82 (1.85x). (The pre-packing kernel LOST at
    # temporal — key padding to the 128-lane — hence the packed layout.
    # Whole-model the spatial win dominates; see BASELINE.md.)
    if (impl == "pallas" and bias is None and kv_valid is None
            and q.shape[1] == k.shape[1]
            and q.shape[-1] <= 128 and n < 512):
        from .short_attention import short_attention

        return short_attention(q, k, v)
    # The streaming flash kernel only pays off for long sequences (its
    # O(N*D) memory advantage); mid sequences lose to per-program grid
    # overhead (round-2 A/B: spatial (256,197) flash 6.35 ms, temporal
    # (1576,32) flash 16.85 — both beaten by the short kernel above).
    if impl == "pallas" and q.shape[-1] <= 128 and n >= 512:
        from .flash_attention import flash_attention

        # Block choice (swept on v5e at the ViViT-B shape, B8 N3137 H12 D64
        # bf16): when the whole padded key sequence fits one VMEM-sized
        # block, a single k-block with small q-blocks beats 512x512 by ~17%
        # (no online-rescale traffic; one exp pass). Larger sequences fall
        # back to classic 512x512 streaming.
        n_pad = -(-n // 128) * 128
        if n_pad <= 4096:  # s-tile 256*n_pad*f32 <= 4 MB
            return flash_attention(q, k, v, bias, min(256, n_pad), n_pad,
                                   kv_valid)
        return flash_attention(q, k, v, bias, 512, 512, kv_valid)
    if kv_valid is not None:
        # XLA path: materialize the trailing-key mask as an additive bias.
        pad_bias = TrailingKeyMask(k.shape[1], kv_valid).materialize()
        bias = pad_bias if bias is None else bias + pad_bias
    return jax.nn.dot_product_attention(q, k, v, bias=bias)


def window_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: jax.Array,
    region_id=None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Swin3D windowed attention over (B·nW, N, H, D).

    bias: (H, N, N) relative-position bias (table gather, done by the model).
    region_id: (nW, N) int32 shifted-window region labels (window ``w`` of
    each frame uses row ``w % nW``), or None when the block is unshifted.

    On TPU this dispatches to the fused Pallas kernel
    (ops.window_attention) — the shift mask is recomputed in-kernel from
    region_id and the bias streams per-head, so the broadcast
    (B·nW, H, N, N) bias tensor of the generic path never exists. Elsewhere
    (or for non-sublane-aligned clamped windows) it falls back to XLA with
    exactly the old materialized-bias semantics.
    """
    impl = impl or get_attention_impl()
    n, d = q.shape[1], q.shape[-1]
    if impl == "pallas":
        from .window_attention import supports_shape, window_attention_pallas

        if supports_shape(n, d):
            return window_attention_pallas(q, k, v, bias, region_id)
    # XLA fallback: materialize the combined bias (fine at CPU/test scale).
    bnw = q.shape[0]
    h = bias.shape[0]
    full = bias[None]  # (1, H, N, N)
    if region_id is not None:
        from .window_attention import region_mask

        m = region_mask(region_id)  # (nW, N, N)
        nw = m.shape[0]
        full = full[None] + m[None, :, None]  # (1, nW, H, N, N)
        full = jnp.broadcast_to(
            full.astype(q.dtype), (bnw // nw, nw, h, n, n)).reshape(bnw, h, n, n)
    else:
        full = full.astype(q.dtype)
    return jax.nn.dot_product_attention(q, k, v, bias=full)


def attention_reference(q, k, v, bias=None):
    """Unfused einsum reference used in kernel tests."""
    d = q.shape[-1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(d).astype(q.dtype)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)
