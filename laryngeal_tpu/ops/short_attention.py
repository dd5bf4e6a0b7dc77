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
# Per-program VMEM budget (bytes) — conservative half of what the window
# kernel's nwin=2 backward was measured to tolerate (~9 MB).
_VMEM_BUDGET = 4 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pick_chunk(nq_pad: int, nk_pad: int, d: int, score_bufs: int) -> int:
    """Batch-heads per program under the VMEM budget (>=1, <=128)."""
    per_bh = (4 * nq_pad * d * 2          # q, o (+g, dq in bwd: covered by 4x)
              + 4 * nk_pad * d * 2        # k, v (+dk, dv)
              + score_bufs * nq_pad * nk_pad * 4)
    c = max(1, _VMEM_BUDGET // per_bh)
    return min(128, c)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_actual):
    q = q_ref[...]  # (C, nq_pad, d)
    k = k_ref[...]  # (C, nk_pad, d)
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (C, nq_pad, nk_pad) f32
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_actual, s, _MASK)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref, *,
                scale, n_actual):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    g = g_ref[...]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(col < n_actual, s, _MASK)
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


def _prep(q, k, v, chunk_score_bufs):
    """(B,N,H,D) -> padded (G_pad, nq_pad, d) batch-head-major tensors."""
    b, n, h, d = q.shape
    nq_pad = _round_up(n, 8)
    nk_pad = _round_up(n, 128)
    c = _pick_chunk(nq_pad, nk_pad, d, chunk_score_bufs)
    g_tot = b * h
    g_pad = _round_up(g_tot, c)

    def to_gnd(x, n_pad):
        x = x.transpose(0, 2, 1, 3).reshape(g_tot, n, d)
        return jnp.pad(x, ((0, g_pad - g_tot), (0, n_pad - n), (0, 0)))

    return (to_gnd(q, nq_pad), to_gnd(k, nk_pad), to_gnd(v, nk_pad),
            c, g_pad, nq_pad, nk_pad)


def _from_gnd(x, b, n, h, d):
    return x[: b * h, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)


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
    qp, kp, vp, c, g_pad, nq_pad, nk_pad = _prep(q, k, v, chunk_score_bufs=2)
    qsp, ksp = _specs(c, nq_pad, nk_pad, d, interpret)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_actual=n),
        grid=(g_pad // c,),
        in_specs=[qsp, ksp, ksp],
        out_specs=qsp,
        out_shape=jax.ShapeDtypeStruct((g_pad, nq_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return _from_gnd(out, b, n, h, d), (q, k, v)


def _short_attention_bwd(interpret, res, grad):
    interpret = _resolve_interpret(interpret)
    q, k, v = res
    b, n, h, d = q.shape
    scale = 1.0 / float(d) ** 0.5
    qp, kp, vp, c, g_pad, nq_pad, nk_pad = _prep(q, k, v, chunk_score_bufs=4)
    gp = _prep(grad.astype(q.dtype), k, v, chunk_score_bufs=4)[0]
    qsp, ksp = _specs(c, nq_pad, nk_pad, d, interpret)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_actual=n),
        grid=(g_pad // c,),
        in_specs=[qsp, ksp, ksp, qsp],
        out_specs=(qsp, ksp, ksp),
        out_shape=(jax.ShapeDtypeStruct((g_pad, nq_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((g_pad, nk_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((g_pad, nk_pad, d), v.dtype)),
        interpret=interpret,
    )(qp, kp, vp, gp)
    return (_from_gnd(dq, b, n, h, d), _from_gnd(dk, b, n, h, d),
            _from_gnd(dv, b, n, h, d))


short_attention.defvjp(_short_attention_fwd, _short_attention_bwd)
