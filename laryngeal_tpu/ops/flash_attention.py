"""Pallas TPU flash attention (forward) with recompute VJP.

Motivation: ViViT-B's joint space-time attention runs at N=3137 tokens —
materializing the (N, N) logits for B*H = 96 heads costs ~3.8 GB of HBM
traffic per layer in f32. This kernel streams K/V blocks through VMEM with
an online softmax (running max/sum), so HBM traffic is O(N*D) per head:
classic flash attention, sized for the MXU (block_q x block_k logits tiles,
f32 accumulation via ``preferred_element_type``).

Scope: non-causal, no attention bias (Swin's biased window attention stays
on the XLA path — its windows are only 392 tokens), head_dim <= 128.
Backward uses recompute through the unfused reference (XLA) — training
correctness without a hand-written backward kernel; the forward-heavy
inference path (the north-star benchmark) gets the full benefit.

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
    """One (batch*head, q_block) program: online softmax over K/V blocks."""
    q = q_ref[0].astype(jnp.float32)  # (block_q, D)
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k)
        # Mask keys beyond the true sequence length (zero-padded tail).
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        s = jnp.where(col + i * block_k < n_actual, s, -1e30)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m, l, acc = jax.lax.fori_loop(0, num_kb, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attention_kernel_bias(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale,
                           block_k, n_actual):
    """Bias variant: additive logits bias (per batch*head) streams in K-blocks
    alongside K/V — serves Swin3D's relative-position-bias + shift-mask
    windowed attention."""
    q = q_ref[0].astype(jnp.float32)
    block_q, d = q.shape
    n_pad = k_ref.shape[1]
    num_kb = n_pad // block_k

    m0 = jnp.full((block_q, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
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
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    bias: Optional[jax.Array] = None,
    block_q: int = 256,
    block_k: int = 256,
) -> jax.Array:
    """Scaled dot-product attention over (B, N, H, D).

    bias is a *differentiated* argument (it may be traced — e.g. Swin3D's
    relative-position-bias table params under jit — and needs gradients);
    only the static block sizes are nondiff.
    """
    return _flash_forward(q, k, v, bias, block_q, block_k)


def _flash_forward(q, k, v, bias, block_q, block_k, interpret: Optional[bool] = None):
    b, n, h, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / math.sqrt(d)

    # (B, N, H, D) -> (B*H, N, D)
    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, x.shape[1], d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)
    n_pad_q = -(-n // block_q) * block_q
    n_pad_k = -(-n // block_k) * block_k
    qb = _pad_to(qb, n_pad_q, 1)
    kb = _pad_to(kb, n_pad_k, 1)
    vb = _pad_to(vb, n_pad_k, 1)

    grid = (b * h, n_pad_q // block_q)
    mem = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    q_spec = pl.BlockSpec((1, block_q, d), lambda bh, qi: (bh, qi, 0), **mem)
    kv_spec = pl.BlockSpec((1, n_pad_k, d), lambda bh, qi: (bh, 0, 0), **mem)
    out_shape = jax.ShapeDtypeStruct((b * h, n_pad_q, d), q.dtype)

    if bias is None:
        kernel = functools.partial(
            _attention_kernel, scale=scale, block_k=block_k, n_actual=n
        )
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qb, kb, vb)
    else:
        # Broadcast bias to (B*H, Nq_pad, Nk_pad); padded logits masked by
        # n_actual inside the kernel, padded bias values are irrelevant.
        bias4 = jnp.broadcast_to(bias.astype(q.dtype), (b, h, n, n))
        bias3 = bias4.reshape(b * h, n, n)
        bias3 = _pad_to(_pad_to(bias3, n_pad_q, 1), n_pad_k, 2)
        bias_spec = pl.BlockSpec((1, block_q, n_pad_k),
                                 lambda bh, qi: (bh, qi, 0), **mem)
        kernel = functools.partial(
            _attention_kernel_bias, scale=scale, block_k=block_k, n_actual=n
        )
        out = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, bias_spec],
            out_specs=q_spec, out_shape=out_shape, interpret=interpret,
        )(qb, kb, vb, bias3)
    out = out[:, :n].reshape(b, h, n, d).transpose(0, 2, 1, 3)
    return out


def _reference(q, k, v, bias=None):
    d = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / math.sqrt(d)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)).astype(q.dtype)


def _fwd(q, k, v, bias, block_q, block_k):
    return _flash_forward(q, k, v, bias, block_q, block_k), (q, k, v, bias)


def _bwd(block_q, block_k, res, g):
    # Recompute-through-XLA backward: exact gradients, no bwd kernel needed.
    q, k, v, bias = res
    if bias is None:
        _, vjp = jax.vjp(lambda q, k, v: _reference(q, k, v, None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None
    _, vjp = jax.vjp(_reference, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
