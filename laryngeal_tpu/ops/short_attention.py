"""Pallas TPU batched SHORT-sequence attention (TimeSformer's divided attn).

Motivation (round-3 MFU ablation, BASELINE.md): TimeSformer's divided
space-time attention issues thousands of tiny attentions — temporal
N=32 over B*spatial*heads = 18.8k batch-heads, spatial N=197 over 3.1k —
and both XLA (3.76 / 3.98 ms per layer-call) and the streaming flash kernel
(16.85 / 6.35 ms — per-program grid overhead at tiny N) run far above the
HBM bound (~0.4 ms). At these sizes the (N, N) score matrix fits VMEM
whole, so flash machinery is pure overhead. This kernel instead:

- folds (batch, heads) into one G axis and gives each program a CHUNK of
  ``C`` batch-heads as a single batched ``dot_general`` (Mosaic loops the
  batch dim over back-to-back MXU issues — no inter-program overhead);
- computes the full softmax in VMEM (one exp pass, no online rescale);
- pads queries to sublane (8) and keys to lane (128) multiples only —
  HBM traffic is one read of q/k/v + one write of o;
- backward recomputes p per program and produces dq/dk/dv with five
  batched matmuls, all resident in VMEM (no (N, N) tensor in HBM either
  direction).

For TINY sequences (N < 128 — TimeSformer's temporal N=32) padding keys to
the 128-lane costs 4-16x, so the kernel instead PACKS ``P = 128 // s``
sequences (s = N rounded up to a power of two) into one 128-wide score
matrix with a block-diagonal validity mask: score tiles are full 128x128
MXU issues of which exactly 1/P is useful work, versus 1/P^2-utilized
issues for the naive batched layout. Masked-softmax zeros kill all
cross-sequence terms, so forward AND backward matmuls run on the packed
layout unchanged. (This is NOT the refuted head-packing from the Swin3D
ablation: packing there grew the contraction dim h*D to 128 and squared
the score work; here the contraction stays d and the score work is
P * useful, traded against P^2-wasteful tiles.)

Scope: self-attention (Nq == Nk), no bias, head_dim <= 128, N <= 512.
Layout: (batch, seq, heads, head_dim), matching ops.attention. The router
in ops/attention.py decides when this kernel beats XLA (measured on
hardware; see BASELINE.md).

Reference parity: this accelerates HF TimesformerSelfAttention
(timesformer/.../models/timesformer.py via transformers) numerics-unchanged
up to fp reassociation; parity pinned in tests/test_short_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_MASK = -1e30
# Per-program VMEM budget (bytes). Hardware chunk sweep at the TimeSformer
# shapes (v5e, /tmp-sweep recorded in BASELINE.md): throughput peaks at
# c~12 for BOTH geometries — temporal packed (128,128) fwd 2.70 ms at c=12
# vs 4.46 at the old 4 MB budget's c=16 (a measured Mosaic cliff at 16),
# spatial (200,256) bwd best at c=12 (12.6 MB resident, compiles; c=16 at
# 16.8 MB fails VMEM). So: budget 13 MB, hard cap 12.
_VMEM_BUDGET = 13 * 1024 * 1024
_MAX_CHUNK = 12


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pow2_at_least(n: int) -> int:
    p = 8
    while p < n:
        p *= 2
    return p


def _pick_chunk(nq_pad: int, nk_pad: int, d: int, score_bufs: int) -> int:
    """Batch-heads per program under the VMEM budget (>=1, <=_MAX_CHUNK)."""
    per_bh = (4 * nq_pad * d * 2          # q, o (+g, dq in bwd: covered by 4x)
              + 4 * nk_pad * d * 2        # k, v (+dk, dv)
              + score_bufs * nq_pad * nk_pad * 4)
    c = max(1, _VMEM_BUDGET // per_bh)
    return min(_MAX_CHUNK, c)


def _mask_scores(s, n_actual, s_q, s_k):
    """Kill padded key columns and (when packing) cross-sequence blocks."""
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    valid = (col % s_k) < n_actual
    if s_k < s.shape[2]:  # packed: multiple sequences share the lane dim
        row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = valid & ((col // s_k) == (row // s_q))
    return jnp.where(valid, s, _MASK)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_actual, s_q, s_k):
    q = q_ref[...]  # (C, nq_pad, d)
    k = k_ref[...]  # (C, nk_pad, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (C, nq_pad, nk_pad) f32
    s = _mask_scores(s, n_actual, s_q, s_k)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale, n_actual, s_q, s_k):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = _mask_scores(s, n_actual, s_q, s_k)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)

    pc = p.astype(v.dtype)
    # dv = p^T g : contract the query dim.
    dv = jax.lax.dot_general(
        pc, g, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    # dp = g v^T : contract d.
    dp = jax.lax.dot_general(
        g, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _layout(n: int, d: int, chunk_score_bufs: int, g_tot: int):
    """Padded/packed geometry for sequence length n.

    Returns (P, s_q, s_k, R, K, c, g_rows) where each program sees
    (c, R, d) query rows and (c, K, d) keys; P sequences share a row/lane
    block of stride s_q/s_k; g_rows is the padded grid extent.
    """
    if n < 128:  # pack P sequences into the 128-lane score width
        s = _pow2_at_least(n)
        p = 128 // s
        r = k_w = 128
        s_q = s_k = s
    else:
        p = 1
        r = _round_up(n, 8)
        k_w = _round_up(n, 128)
        s_q, s_k = r, k_w
    c = _pick_chunk(r, k_w, d, chunk_score_bufs)
    g_rows = _round_up(-(-g_tot // p), c)
    return p, s_q, s_k, r, k_w, c, g_rows


def _prep(q, k, v, chunk_score_bufs):
    """(B,N,H,D) -> padded/packed (G_pad, R, d) batch-head-major tensors."""
    b, n, h, d = q.shape
    g_tot = b * h
    p, s_q, s_k, r, k_w, c, g_rows = _layout(n, d, chunk_score_bufs, g_tot)

    def to_gnd(x, s_pad, row_w):
        x = x.transpose(0, 2, 1, 3).reshape(g_tot, n, d)
        # Pad each sequence to its block stride, then fold P per row-group.
        x = jnp.pad(x, ((0, g_rows * p - g_tot), (0, s_pad - n), (0, 0)))
        return x.reshape(g_rows, row_w, d)

    return (to_gnd(q, s_q, r), to_gnd(k, s_k, k_w), to_gnd(v, s_k, k_w),
            c, g_rows, r, k_w, p, s_q, s_k)


def _from_gnd(x, b, n, h, d, p, s_pad):
    x = x.reshape(-1, s_pad, d)[: b * h, :n]
    return x.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _specs(c, nq_pad, nk_pad, d, interpret):
    mem = (dict(memory_space=_VMEM)
           if (_VMEM is not None and not interpret) else {})
    qsp = pl.BlockSpec((c, nq_pad, d), lambda i: (i, 0, 0), **mem)
    ksp = pl.BlockSpec((c, nk_pad, d), lambda i: (i, 0, 0), **mem)
    return qsp, ksp


def _resolve_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def short_attention(q, k, v, interpret: Optional[bool] = None):
    """Batched full-softmax attention for short self-attention sequences.

    q, k, v: (B, N, H, D) with N == Nk (self-attention), no bias.
    Returns (B, N, H, D) in q's dtype.
    """
    return _short_attention_fwd(q, k, v, interpret)[0]


def _short_attention_fwd(q, k, v, interpret):
    interpret = _resolve_interpret(interpret)
    b, n, h, d = q.shape
    scale = 1.0 / float(d) ** 0.5
    qp, kp, vp, c, g_rows, r, k_w, p, s_q, s_k = _prep(
        q, k, v, chunk_score_bufs=2)
    qsp, ksp = _specs(c, r, k_w, d, interpret)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_actual=n,
                          s_q=s_q, s_k=s_k),
        grid=(g_rows // c,),
        in_specs=[qsp, ksp, ksp],
        out_specs=qsp,
        out_shape=jax.ShapeDtypeStruct((g_rows, r, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return _from_gnd(out, b, n, h, d, p, s_q), (q, k, v)


def _short_attention_bwd(interpret, res, grad):
    interpret = _resolve_interpret(interpret)
    q, k, v = res
    b, n, h, d = q.shape
    scale = 1.0 / float(d) ** 0.5
    qp, kp, vp, c, g_rows, r, k_w, p, s_q, s_k = _prep(
        q, k, v, chunk_score_bufs=4)
    gp = _prep(grad.astype(q.dtype), k, v, chunk_score_bufs=4)[0]
    qsp, ksp = _specs(c, r, k_w, d, interpret)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_actual=n,
                          s_q=s_q, s_k=s_k),
        grid=(g_rows // c,),
        in_specs=[qsp, ksp, ksp, qsp],
        out_specs=(qsp, ksp, ksp),
        out_shape=(jax.ShapeDtypeStruct((g_rows, r, d), q.dtype),
                   jax.ShapeDtypeStruct((g_rows, k_w, d), k.dtype),
                   jax.ShapeDtypeStruct((g_rows, k_w, d), v.dtype)),
        interpret=interpret,
    )(qp, kp, vp, gp)
    return (_from_gnd(dq, b, n, h, d, p, s_q),
            _from_gnd(dk, b, n, h, d, p, s_k),
            _from_gnd(dv, b, n, h, d, p, s_k))


short_attention.defvjp(_short_attention_fwd, _short_attention_bwd)
