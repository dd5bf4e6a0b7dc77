"""Pallas TPU 3D shifted-window attention for Swin3D (fwd + bwd).

Parity target: the windowed MHA inside torchvision's ``swin3d_*`` blocks
(reference use: ``videoswintransformer/swin_video_classifier/models/
swin3d.py:7-53``); consumed by ``models/swin3d.py::WindowAttention3D``.

Why a dedicated kernel: Swin's attention bias has structure —
``bias[b·w, h] = rel_pos_bias[h] + shift_mask[w % nW]`` — that the generic
biased-attention path can only express by materializing the broadcast
``(B·nW, H, N, N)`` tensor in HBM (~2 GB per layer invocation at stage 1,
batch 8; round-1 VERDICT weak #8). Here the two factors stay small:

- ``bias`` (H, N, N) f32: the relative-position-bias table gather, done once
  in XLA (O(H·N²), ~2 MB); streamed per-head and VMEM-resident across the
  whole inner batch·window sweep (grid is (H, B·nW) with h OUTER).
- ``region_id`` (nW, N) int32: the shifted-window region labels; the
  ``-100``-across-regions mask is recomputed in-VMEM per program from a
  392-int vector instead of being read as an (N, N) HBM tensor.

One program = one (head, batch·window): the full N=392 window fits VMEM, so
the softmax is exact (no online rescaling) and the backward recomputes P
from the inputs — no residuals beyond the primal inputs, and no
(B·nW, H, N, N) tensor in either direction. dbias accumulates in VMEM
across the inner grid dimension (consecutive programs revisit the same
(h) output block) and is written back once per head.

N must be a multiple of 8 (Mosaic sublane tiling): true for every full
(8,7,7) window (392) and every clamped window whose product stays 8-aligned;
other shapes fall back to the XLA path in ops.attention.window_attention.

Layout: q/k/v/out (B·nW, N, H, D).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu only resolves on TPU builds; interpret mode works anywhere.
    from jax.experimental.pallas import tpu as pltpu

    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None

_MASK_VALUE = -100.0  # torch swin uses -100 across shifted-region boundaries


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, rid_ref, o_ref, *, scale, nwin):
    """One (head, window-block) program: ``nwin`` full-window attentions.

    Batching ``nwin`` windows per program (statically unrolled) amortizes
    per-program grid overhead; the rel-pos bias stays head-resident exactly
    as before. Measured effect at Swin3D-T 32x224^2 B8 fwd: 40.4 -> 37.7 ms
    attention (84.2 -> 81.2 ms model) — modest, because the kernel is bound
    by the quarter-rate (D=32) MXU matmuls and the f32 softmax VPU work on
    392->512-lane-padded tiles, both intrinsic to Swin's window shape, not
    by dispatch overhead.

    Round-3 negative result (don't retry): replacing this unrolled loop
    with ONE batched 3-D dot_general over the window axis — the rewrite
    that took the short-attention kernel from 4.46 to 2.70 ms — measured
    EQUAL here (stage1/2/3 fwd 1.575/1.511/1.397 vs 1.621/1.510/1.374 ms,
    noise) and VMEM-OOMed at stage 4 (all nwin=8 score tiles live at once:
    16.7 MB > the 16 MB scoped limit, where the loop reuses one tile's
    buffers). At 392x392 score sizes the MXU issues are long enough that
    the loop pipelines fine; the batched win only exists for tiny tiles.

    Matmuls run in the input dtype (bf16 MXU path) with f32 accumulation;
    softmax is f32."""
    single_rid = rid_ref.shape[0] == 1
    for w in range(nwin):
        q = q_ref[w, 0]  # (N, D)
        k = k_ref[w, 0]
        v = v_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0]
        rid = rid_ref[0 if single_rid else w]  # (N, 1) int32
        s = jnp.where(rid != rid.reshape(1, -1), s + _MASK_VALUE, s)
        p = jax.nn.softmax(s, axis=-1)
        o_ref[w, 0] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, rid_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *, scale, nwin):
    """Recompute P, emit dq/dk/dv for ``nwin`` windows, accumulate dbias[h]."""
    # dbias[h] = sum over (b, w) of ds — the inner grid dim revisits the same
    # (h) block, so this accumulates in VMEM and spills once per head.
    @pl.when(pl.program_id(1) == 0)
    def _():
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    single_rid = rid_ref.shape[0] == 1
    ds_acc = None
    for w in range(nwin):
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        v = v_ref[w, 0]
        g = g_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0]
        rid = rid_ref[0 if single_rid else w]
        s = jnp.where(rid != rid.reshape(1, -1), s + _MASK_VALUE, s)
        p = jax.nn.softmax(s, axis=-1)

        dv = jax.lax.dot_general(
            p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta)  # == d(loss)/d(logits) == d/d(bias) contribution
        ds_lp = ds.astype(q.dtype)
        dq_ref[w, 0] = (jax.lax.dot_general(
            ds_lp, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype)
        dk_ref[w, 0] = (jax.lax.dot_general(
            ds_lp, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dk_ref.dtype)
        dv_ref[w, 0] = dv.astype(dv_ref.dtype)
        ds_acc = ds if ds_acc is None else ds_acc + ds

    dbias_ref[0] += ds_acc


def _pick_nwin(bw: int, nw: int) -> int:
    """Windows per program: largest of 8/4/2/1 dividing the window count
    (and the mask period, so each program's rid rows are consecutive)."""
    for w in (8, 4, 2):
        if bw % w == 0 and (nw == 1 or nw % w == 0):
            return w
    return 1


def _specs(bw, h, n, d, nw, nwin, interpret):
    mem = dict(memory_space=_VMEM) if (_VMEM is not None and not interpret) else {}
    qkv = pl.BlockSpec((nwin, 1, n, d), lambda hi, bwi: (bwi, hi, 0, 0), **mem)
    bias = pl.BlockSpec((1, n, n), lambda hi, bwi: (hi, 0, 0), **mem)
    if nw == 1:
        rid = pl.BlockSpec((1, n, 1), lambda hi, bwi: (0, 0, 0), **mem)
    else:
        rid = pl.BlockSpec((nwin, n, 1),
                           lambda hi, bwi: (jax.lax.rem(bwi, nw // nwin), 0, 0),
                           **mem)
    return qkv, bias, rid


def _prep(q, k, v, bias, region_id):
    bw, n, h, d = q.shape
    qt = q.transpose(0, 2, 1, 3)  # (BW, H, N, D)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    bias = bias.astype(jnp.float32)
    if region_id is None:
        rid = jnp.zeros((1, n, 1), jnp.int32)
    else:
        rid = jnp.asarray(region_id, jnp.int32).reshape(-1, n, 1)
    return qt, kt, vt, bias, rid


def _window_attention_fwd_impl(q, k, v, bias, region_id, interpret):
    bw, n, h, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt, bias, rid = _prep(q, k, v, bias, region_id)
    nw = rid.shape[0]
    nwin = _pick_nwin(bw, nw)
    qkv_spec, bias_spec, rid_spec = _specs(bw, h, n, d, nw, nwin, interpret)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, nwin=nwin),
        grid=(h, bw // nwin),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, rid_spec],
        out_specs=qkv_spec,
        out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, bias, rid)
    return out.transpose(0, 2, 1, 3)


def _window_attention_bwd_impl(q, k, v, bias, region_id, g, interpret):
    bw, n, h, d = q.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt, bias_f, rid = _prep(q, k, v, bias, region_id)
    gt = g.transpose(0, 2, 1, 3)
    nw = rid.shape[0]
    # The backward holds ~4x the fwd's live tiles per window (s/p/dp/ds +
    # three output blocks); on Mosaic the statically unrolled multi-window
    # loop exceeded the 16 MB scoped-VMEM limit at nwin=8 (measured 18.1 MB
    # at the N=392 stage-1 shape). One window per program is the proven
    # configuration — only the forward batches windows.
    nwin = 1
    qkv_spec, bias_spec, rid_spec = _specs(bw, h, n, d, nw, nwin, interpret)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, nwin=nwin),
        grid=(h, bw // nwin),
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, rid_spec, qkv_spec],
        out_specs=(qkv_spec, qkv_spec, qkv_spec, bias_spec),
        out_shape=(jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((bw, h, n, d), k.dtype),
                   jax.ShapeDtypeStruct((bw, h, n, d), v.dtype),
                   jax.ShapeDtypeStruct((h, n, n), jnp.float32)),
        interpret=interpret,
    )(qt, kt, vt, bias_f, rid, gt)
    return (dq.transpose(0, 2, 1, 3), dk.transpose(0, 2, 1, 3),
            dv.transpose(0, 2, 1, 3), dbias.astype(bias.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def window_attention_pallas(q, k, v, bias, region_id):
    """q/k/v (B·nW, N, H, D); bias (H, N, N); region_id (nW, N) int32 or a
    (1, N) zeros array for unshifted blocks. Returns (B·nW, N, H, D)."""
    return _window_attention_fwd_impl(q, k, v, bias, region_id, None)


def _wa_fwd(q, k, v, bias, region_id):
    return (_window_attention_fwd_impl(q, k, v, bias, region_id, None),
            (q, k, v, bias, region_id))


def _wa_bwd(res, g):
    q, k, v, bias, region_id = res
    dq, dk, dv, dbias = _window_attention_bwd_impl(q, k, v, bias, region_id, g, None)
    # region_id is integral (or None): cotangent is float0 / empty pytree.
    drid = (None if region_id is None
            else np.zeros(region_id.shape, dtype=jax.dtypes.float0))
    return dq, dk, dv, dbias, drid


window_attention_pallas.defvjp(_wa_fwd, _wa_bwd)


def supports_shape(n: int, d: int) -> bool:
    """Mosaic tiling gate: window length must be sublane-aligned."""
    return n % 8 == 0 and d <= 256


def region_mask(region_id) -> jnp.ndarray:
    """(nW, N) region ids -> (nW, N, N) additive mask (XLA fallback path)."""
    rid = jnp.asarray(region_id)
    return jnp.where(
        rid[:, :, None] != rid[:, None, :], _MASK_VALUE, 0.0
    ).astype(jnp.float32)
