"""Pallas TPU flash attention (forward) with recompute VJP.

Motivation: ViViT-B's joint space-time attention runs at N=3137 tokens —
materializing the (N, N) logits for B*H = 96 heads costs ~3.8 GB of HBM
traffic per layer in f32. This kernel streams K/V blocks through VMEM with
an online softmax (running max/sum), so HBM traffic is O(N*D) per head:
classic flash attention, sized for the MXU (block_q x block_k logits tiles,
f32 accumulation via ``preferred_element_type``).

Scope: non-causal, head_dim <= 128. Training is the reference's primary
workload (the hot loop, ``vivit_transformer/vivit_classifier/trainers/
trainer.py:134-167``), so the backward is a real flash backward — the
standard two-kernel recompute scheme:

- dq kernel (grid: q blocks): stream K/V blocks, recompute P from the saved
  per-row logsumexp, accumulate ``dq += scale * dS @ K``;
- dk/dv kernel (grid: k blocks): stream Q/dO blocks, accumulate
  ``dv += P^T dO`` and ``dk += scale * dS^T Q``;

with ``dS = P * (dP - delta)``, ``delta = rowsum(dO * O)`` (computed in XLA,
O(N*D)). No (N, N) tensor ever hits HBM in either direction — forward saves
only O and the (B*H, N) logsumexp.

The *biased* path (additive logits bias) keeps the recompute-through-XLA
backward: its only in-tree consumer was Swin3D's windowed attention, which
now routes through ops.window_attention's fused kernel; the generic biased
entry stays for API completeness at small N where XLA recompute is fine.

Layout: (batch, seq, heads, head_dim), matching ops.attention.
"""

from __future__ import annotations

import functools
import math
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


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, block_k, n_actual):
    """One (batch*head, q_block) program: online softmax over K/V blocks.

    Matmuls run in the INPUT dtype (bf16 on the training/inference path)
    with f32 accumulation via preferred_element_type — casting operands to
    f32 first would put the MXU on its slow f32 path (measured ~3x on the
    QK^T/PV dots). Softmax statistics stay f32.
    """
    q = q_ref[0]  # (block_q, D), input dtype
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) f32
        # Mask keys beyond the true sequence length (zero-padded tail).
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < n_actual, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attention_kernel_lse(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale,
                          block_k, n_actual):
    """Forward variant that also emits the per-row logsumexp — the residual
    the flash backward needs to recompute P blockwise."""
    q = q_ref[0]
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < n_actual, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l_safe)  # (block_q, 1)


def _dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, dq_ref, *,
               scale, block_k, n_actual):
    """dQ for one (batch*head, q_block): stream K/V, recompute P from lse.

    Matmul operands stay in the input dtype (bf16 MXU path); P/dS are
    computed f32 and cast back for their dots — the standard TPU flash-bwd
    precision scheme.
    """
    q = q_ref[0]                             # (bq, D)
    g = g_ref[0]                             # (bq, D)
    lse = lse_ref[0]                         # (bq, 1) f32
    delta = delta_ref[0]                     # (bq, 1) f32
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    def body(i, acc):
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        p = jnp.where(col + i * block_k < n_actual, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        ds = (p * (dp - delta)).astype(k.dtype)
        return acc + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(
        0, num_kb, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (acc * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, scale, block_q, n_actual):
    """dK/dV for one (batch*head, k_block): stream Q/dO blocks.

    Zero-padded q/dO/delta rows contribute exactly zero (dp = 0, delta = 0
    => dS = 0; P^T dO adds zero rows), so no row masking is needed; padded
    key rows of the dk/dv outputs are sliced off by the caller.
    """
    k = k_ref[0]                             # (bk, D)
    v = v_ref[0]
    block_k, d = k.shape
    n_pad = q_ref.shape[1]
    num_qb = n_pad // block_q
    kb0 = pl.program_id(1) * block_k
    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1) + kb0

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        g = g_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, pl.ds(i * block_q, block_q), :]    # (bq, 1)
        delta = delta_ref[0, pl.ds(i * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (bq, bk)
        p = jnp.where(col < n_actual, jnp.exp(s - lse), 0.0)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bk, D)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta)).astype(q.dtype)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk_acc, dv_acc

    zeros = jnp.zeros((block_k, d), jnp.float32)
    dk_acc, dv_acc = jax.lax.fori_loop(0, num_qb, body, (zeros, zeros))
    dk_ref[0] = (dk_acc * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)


def _attention_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                           block_k, n_actual):
    """Bias variant: additive logits bias (per batch*head) streams in K-blocks
    alongside K/V — the generic biased-attention API (Swin3D uses the fused
    ops.window_attention kernel instead)."""
    q = q_ref[0]
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0, :, pl.ds(i * block_k, block_k)].astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < n_actual, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_q: int = 256,
    block_k: int = 256,
    kv_valid: Optional[int] = None,
) -> jax.Array:
    """Scaled dot-product attention over (B, Nq, H, D) x (B, Nk, H, D).

    Nq and Nk may differ (cross attention; used by the sequence-parallel
    path, parallel/sp.py, where each device holds Nq = N/s query tokens
    against the all-gathered full key/value sequence).

    bias is a *differentiated* argument (it may be traced — e.g. Swin3D's
    relative-position-bias table params under jit — and needs gradients);
    only the static block sizes are nondiff. ``kv_valid`` (static) masks
    keys >= kv_valid out of the softmax — the in-kernel form of a trailing
    key-padding mask (sp's padded token tail), costing nothing over the
    padding mask the kernel already applies.
    """
    return _flash_forward(q, k, v, bias, block_q, block_k, kv_valid=kv_valid)


def _to_bh(x):
    """(B, N, H, D) -> (B*H, N, D)."""
    b, n, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _from_bh(x, b, h):
    """(B*H, N, D) -> (B, N, H, D)."""
    bh, n, d = x.shape
    return x.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _flash_forward(q, k, v, bias, block_q, block_k,
                   interpret: Optional[bool] = None, return_lse: bool = False,
                   kv_valid: Optional[int] = None):
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    n_mask = n_k if kv_valid is None else min(kv_valid, n_k)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / math.sqrt(d)

    qb, kb, vb = _to_bh(q), _to_bh(k), _to_bh(v)
    n_pad_q = -(-n_q // block_q) * block_q
    n_pad_k = -(-n_k // block_k) * block_k
    qb = _pad_to(qb, n_pad_q, 1)
    kb = _pad_to(kb, n_pad_k, 1)
    vb = _pad_to(vb, n_pad_k, 1)

    grid = (b * h, n_pad_q // block_q)
    mem = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), **mem)
    kv_spec = pl.BlockSpec((1, n_pad_k, d), lambda bh, qi: (bh, 0, 0), **mem)
    out_shape = jax.ShapeDtypeStruct((b * h, n_pad_q, d), q.dtype)

    if bias is None and return_lse:
        # lse rides as (BH, N_pad, 1): Mosaic wants the last two block dims
        # divisible by (8, 128) or equal to the array dims — (block_q, 1)
        # satisfies that, (1, block_q) does not.
        lse_spec = pl.BlockSpec((1, block_q, 1), lambda bh, qi: (bh, qi, 0), **mem)
        kernel = functools.partial(
            _attention_kernel_lse, scale=scale, block_k=block_k, n_actual=n_mask
        )
        out, lse = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=(q_spec, lse_spec),
            out_shape=(out_shape,
                       jax.ShapeDtypeStruct((b * h, n_pad_q, 1), jnp.float32)),
            interpret=interpret,
        )(qb, kb, vb)
        return _from_bh(out[:, :n_q], b, h), lse
    if bias is None:
        kernel = functools.partial(
            _attention_kernel, scale=scale, block_k=block_k, n_actual=n_mask
        )
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qb, kb, vb)
    else:
        # Broadcast bias to (B*H, Nq_pad, Nk_pad); padded logits masked by
        # n_actual inside the kernel, padded bias values are irrelevant.
        bias4 = jnp.broadcast_to(bias.astype(q.dtype), (b, h, n_q, n_k))
        bias3 = bias4.reshape(b * h, n_q, n_k)
        bias3 = _pad_to(_pad_to(bias3, n_pad_q, 1), n_pad_k, 2)
        bias_spec = pl.BlockSpec((1, block_q, n_pad_k),
                                 lambda bh, qi: (bh, qi, 0), **mem)
        kernel = functools.partial(
            _attention_kernel_bias, scale=scale, block_k=block_k, n_actual=n_mask
        )
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qb, kb, vb, bias3)
    return _from_bh(out[:, :n_q], b, h)


# Backward block-size candidates, chosen per sequence length: sublane-dim
# (q) blocks only need to be multiples of 8 and lane-dim (k) blocks of 128,
# so 320/640 tile N=3137's npad128=3200 EXACTLY where 256/512 pad each axis
# to 3328 — hardware sweep: 11.3 vs 13.0 ms/iter fwd+bwd at the ViViT-B
# shape (-13%, BASELINE.md). For power-of-two N the 512-family pads less
# and wins instead; ``_pick_block`` minimizes padded length per axis.
_DQ_BLOCK_Q_CANDIDATES = (256, 320)
_DKV_BLOCK_Q_CANDIDATES = (512, 640)
_DKV_BLOCK_K_CANDIDATES = (512, 640)


def _pick_block(n: int, candidates) -> int:
    """Smallest padded length wins; larger block breaks ties (fewer grid
    steps). All candidates satisfy Mosaic's tiling rules for their axis."""
    return min(candidates, key=lambda b: (-(-n // b) * b, -b))


def _flash_backward(q, k, v, o, lse_pad, g,
                    interpret: Optional[bool] = None,
                    kv_valid: Optional[int] = None):
    """dq/dk/dv via the two-kernel flash scheme. ``lse_pad`` is the forward's
    (B*H, n_pad_q) logsumexp. No (N, N) tensor is materialized in HBM.
    Handles Nq != Nk (sequence-parallel q-shards against full k/v) and the
    static ``kv_valid`` trailing-key mask; masked keys get exactly-zero
    dk/dv (p = 0 kills both accumulation paths).

    Block sizes are chosen HERE, independently of the forward's (lse is
    per-row; re-blocking only needs a re-pad): the dq kernel can afford a
    single big k-block like the fwd; the dk/dv kernel holds more live tiles
    (s, p, dp, ds + two accumulators) and VMEM-OOMs there — it streams
    classic 512 blocks."""
    b, n_q, h, d = q.shape
    n_k = k.shape[1]
    n_mask = n_k if kv_valid is None else min(kv_valid, n_k)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / math.sqrt(d)

    npad128_q = -(-n_q // 128) * 128
    npad128_k = -(-n_k // 128) * 128
    dq_block_q = min(_pick_block(n_q, _DQ_BLOCK_Q_CANDIDATES), npad128_q)
    dq_block_k = npad128_k if npad128_k <= 4096 else 512
    block_q = min(_pick_block(n_q, _DKV_BLOCK_Q_CANDIDATES), npad128_q)
    block_k = min(_pick_block(n_k, _DKV_BLOCK_K_CANDIDATES), npad128_k)

    # delta = rowsum(dO * O): O(N*D) elementwise in XLA; shaped (BH, N, 1)
    # like lse (see the Mosaic block-dim note in _flash_forward).
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    delta = delta.transpose(0, 2, 1).reshape(b * h, n_q, 1)

    lse_pad = lse_pad[:, :n_q]  # trim the forward's padding before re-blocking
    n_pad_q = -(-n_q // block_q) * block_q
    n_pad_k = -(-n_k // block_k) * block_k
    # dq grid uses its own (finer q, full k) padding.
    n_pad_q_dq = -(-n_q // dq_block_q) * dq_block_q
    n_pad_k_dq = -(-n_k // dq_block_k) * dq_block_k
    n_pad_q_max = max(n_pad_q, n_pad_q_dq)
    n_pad_k_max = max(n_pad_k, n_pad_k_dq)
    qb = _pad_to(_to_bh(q), n_pad_q_max, 1)
    gb = _pad_to(_to_bh(g), n_pad_q_max, 1)
    kb = _pad_to(_to_bh(k), n_pad_k_max, 1)
    vb = _pad_to(_to_bh(v), n_pad_k_max, 1)
    delta = _pad_to(delta, n_pad_q_max, 1)
    lse_pad = _pad_to(lse_pad, n_pad_q_max, 1)

    mem = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    dq_qblk = pl.BlockSpec((1, dq_block_q, d), lambda bh, qi: (bh, qi, 0), **mem)
    dq_kv = pl.BlockSpec((1, n_pad_k_dq, d), lambda bh, qi: (bh, 0, 0), **mem)
    dq_row = pl.BlockSpec((1, dq_block_q, 1), lambda bh, qi: (bh, qi, 0), **mem)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, block_k=dq_block_k,
                          n_actual=n_mask),
        grid=(b * h, n_pad_q_dq // dq_block_q),
        in_specs=[dq_qblk, dq_kv, dq_kv, dq_qblk, dq_row, dq_row],
        out_specs=dq_qblk,
        out_shape=jax.ShapeDtypeStruct((b * h, n_pad_q_dq, d), q.dtype),
        interpret=interpret,
    )(qb[:, :n_pad_q_dq], kb[:, :n_pad_k_dq], vb[:, :n_pad_k_dq],
      gb[:, :n_pad_q_dq], lse_pad[:, :n_pad_q_dq], delta[:, :n_pad_q_dq])

    kblk = pl.BlockSpec((1, block_k, d), lambda bh, ki: (bh, ki, 0), **mem)
    q_full = pl.BlockSpec((1, n_pad_q, d), lambda bh, ki: (bh, 0, 0), **mem)
    row_full = pl.BlockSpec((1, n_pad_q, 1), lambda bh, ki: (bh, 0, 0), **mem)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, block_q=block_q,
                          n_actual=n_mask),
        grid=(b * h, n_pad_k // block_k),
        in_specs=[q_full, kblk, kblk, q_full, row_full, row_full],
        out_specs=(kblk, kblk),
        out_shape=(jax.ShapeDtypeStruct((b * h, n_pad_k, d), k.dtype),
                   jax.ShapeDtypeStruct((b * h, n_pad_k, d), v.dtype)),
        interpret=interpret,
    )(qb[:, :n_pad_q], kb[:, :n_pad_k], vb[:, :n_pad_k], gb[:, :n_pad_q],
      lse_pad[:, :n_pad_q], delta[:, :n_pad_q])

    return (_from_bh(dq[:, :n_q], b, h),
            _from_bh(dk[:, :n_k], b, h),
            _from_bh(dv[:, :n_k], b, h))


def _reference(q, k, v, bias=None):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / math.sqrt(d)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _fwd(q, k, v, bias, block_q, block_k, kv_valid):
    if bias is None:
        out, lse = _flash_forward(q, k, v, None, block_q, block_k,
                                  return_lse=True, kv_valid=kv_valid)
        return out, (q, k, v, None, out, lse)
    return (_flash_forward(q, k, v, bias, block_q, block_k,
                           kv_valid=kv_valid),
            (q, k, v, bias, None, None))


def _bwd(block_q, block_k, kv_valid, res, g):
    q, k, v, bias, o, lse = res
    if bias is None:
        dq, dk, dv = _flash_backward(q, k, v, o, lse, g, kv_valid=kv_valid)
        return dq, dk, dv, None
    # Biased path: recompute-through-XLA backward (exact; only used for the
    # generic-bias API — Swin3D routes through ops.window_attention).
    if kv_valid is not None:
        # Apply the trailing-key mask INSIDE the vjp'd function (not by
        # pre-adding it to the primal bias): the add broadcasts, and taking
        # the vjp w.r.t. the broadcast-expanded array would return a dbias
        # whose shape no longer matches a broadcastable primal bias (e.g.
        # (H, Nq, Nk) or (1, 1, Nq, Nk)). vjp through the in-closure add
        # sum-reduces the cotangent back to bias's own shape.
        nk = k.shape[1]
        mask = jnp.where(jnp.arange(nk) < kv_valid, 0.0, -1e30
                         ).astype(bias.dtype)[None, None, None, :]
        fn = lambda q_, k_, v_, b_: _reference(q_, k_, v_, b_ + mask)
    else:
        fn = _reference
    _, vjp = jax.vjp(fn, q, k, v, bias)
    dq, dk, dv, dbias = vjp(g)
    return dq, dk, dv, dbias


flash_attention.defvjp(_fwd, _bwd)
