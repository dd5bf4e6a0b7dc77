"""Swin3D window-attention kernel ablation (round-2 VERDICT weak #2 / next #5).

Measures the Pallas window kernel (ops/window_attention.py) against candidate
restructurings at real Swin3D-T 32x224^2 B8 stage shapes, on the TPU, with
chained-jit timing (fori_loop carry dependence, CLAUDE.md microbench rule):

- ``xla``            materialized-bias fallback (ops.attention path)
- ``current``        shipping kernel (one (head, window-block) per program)
- ``bf16sm``         softmax in bf16 after f32 row-max subtraction
- ``exp2``           exp2-based softmax (scale by log2(e); cheaper transcendental)
- ``h2``             2 heads per program via batched dot_general (grid h/2)
- bwd ``nwin=1`` vs ``nwin=2`` (two windows per backward program)

Head-packing arithmetic (why 4xD32 -> 128-lane packing is not a kernel
variant): packing h heads' scores into one full-contraction matmul requires a
block-diagonal operand — Q_pack (N,128) @ K_bd (128, hN) for QK^T, or
P_cat (N, hN) @ V_bd (hN, 128) for PV. Real MACs become h^2 * N^2 * D
(the zero blocks are multiplied too) at full utilization, versus h * N^2 * D
at D/128 utilization unpacked: h^2*N^2*D == (h*N^2*D) * (128/D) exactly when
h*D == 128 — identical MXU occupancy, plus extra VPU work to build the zero
blocks. The systolic array charges padding and zeros the same; packing
relocates the waste, it cannot remove it.

``--probe_only`` measures this empirically (``packdot_probe``): the packed
K=128 block-diagonal dot, with its operand pre-built outside the timed
region, is 1.05-1.49x the unpacked K=32 XLA dot (both HBM-bound on the
materialized score tensor) — yet the packed QK dot ALONE costs as much as
the entire fused kernel stage (1.609 vs 1.621 ms at stage 1), so packing
cannot pay for itself. Numbers in BASELINE.md.

Usage (TPU): python scripts/bench_window_kernel.py [--iters 20] [--stages 1,3]
Results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from laryngeal_tpu.ops import window_attention as WA

# Swin3D-T 32x224^2 B8 stage shapes: (bw, n, h, d), window (8,7,7)-clamped.
STAGES = {
    1: dict(bw=1024, n=392, h=3, d=32),
    2: dict(bw=256, n=392, h=6, d=32),
    3: dict(bw=64, n=392, h=12, d=32),
    4: dict(bw=16, n=392, h=24, d=32),
}


# ---------------------------------------------------------------- variants
def _softmax_bf16(s):
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(jnp.bfloat16).astype(jnp.float32))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _softmax_exp2(s):
    LOG2E = 1.4426950408889634
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp2((s - m) * LOG2E)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel_sm(q_ref, k_ref, v_ref, bias_ref, rid_ref, o_ref, *,
                   scale, nwin, softmax):
    single_rid = rid_ref.shape[0] == 1
    for w in range(nwin):
        q = q_ref[w, 0]
        k = k_ref[w, 0]
        v = v_ref[w, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        s = s + bias_ref[0]
        rid = rid_ref[0 if single_rid else w]
        s = jnp.where(rid != rid.reshape(1, -1), s + WA._MASK_VALUE, s)
        p = softmax(s)
        o_ref[w, 0] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _fwd_kernel_h2(q_ref, k_ref, v_ref, bias_ref, rid_ref, o_ref, *,
                   scale, hblk):
    """hblk heads per program, batched dot_general (grid: (h/hblk, bw))."""
    q = q_ref[0]  # (hblk, N, D)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    s = s + bias_ref[...]  # (hblk, N, N)
    rid = rid_ref[0]  # (N, 1)
    s = jnp.where((rid != rid.reshape(1, -1))[None], s + WA._MASK_VALUE, s)
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def fwd_variant(q, k, v, bias, rid, kind):
    bw, n, h, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt, bias_f, ridp = WA._prep(q, k, v, bias, rid)
    nw = ridp.shape[0]
    if kind in ("bf16sm", "exp2"):
        nwin = WA._pick_nwin(bw, nw)
        qkv, bsp, rsp = WA._specs(bw, h, n, d, nw, nwin, False)
        sm = _softmax_bf16 if kind == "bf16sm" else _softmax_exp2
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_sm, scale=scale, nwin=nwin,
                              softmax=sm),
            grid=(h, bw // nwin),
            in_specs=[qkv, qkv, qkv, bsp, rsp],
            out_specs=qkv,
            out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        )(qt, kt, vt, bias_f, ridp)
        return out.transpose(0, 2, 1, 3)
    if kind == "h2":
        hblk = 2 if h % 2 == 0 else (3 if h % 3 == 0 else 1)
        mem = dict(memory_space=WA._VMEM) if WA._VMEM is not None else {}
        qkv = pl.BlockSpec((1, hblk, n, d), lambda hi, bwi: (bwi, hi, 0, 0),
                           **mem)
        bsp = pl.BlockSpec((hblk, n, n), lambda hi, bwi: (hi, 0, 0), **mem)
        rsp = pl.BlockSpec((1, n, 1),
                           lambda hi, bwi: ((jax.lax.rem(bwi, nw))
                                            if nw > 1 else 0, 0, 0), **mem)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel_h2, scale=scale, hblk=hblk),
            grid=(h // hblk, bw),
            in_specs=[qkv, qkv, qkv, bsp, rsp],
            out_specs=qkv,
            out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        )(qt, kt, vt, bias_f, ridp)
        return out.transpose(0, 2, 1, 3)
    raise ValueError(kind)


def fwd_xla(q, k, v, bias, rid):
    from laryngeal_tpu.ops.window_attention import region_mask

    bw, n, h, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    nw = rid.shape[0]
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    s = jnp.einsum("bhnd,bhmd->bhnm", qt, kt,
                   preferred_element_type=jnp.float32) * scale
    s = s + bias[None]
    mask = region_mask(rid)  # (nW, N, N)
    s = s + jnp.tile(mask, (bw // nw, 1, 1))[:, None]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(vt.dtype), vt,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).astype(q.dtype)


def bwd_nwin2(q, k, v, bias, rid, g):
    """Backward with 2 windows per program (VMEM ~9 MB at stage 1)."""
    bw, n, h, d = q.shape
    scale = 1.0 / float(np.sqrt(d))
    qt, kt, vt, bias_f, ridp = WA._prep(q, k, v, bias, rid)
    gt = g.transpose(0, 2, 1, 3)
    nw = ridp.shape[0]
    nwin = 2 if bw % 2 == 0 and (nw == 1 or nw % 2 == 0) else 1
    qkv, bsp, rsp = WA._specs(bw, h, n, d, nw, nwin, False)
    return pl.pallas_call(
        functools.partial(WA._bwd_kernel, scale=scale, nwin=nwin),
        grid=(h, bw // nwin),
        in_specs=[qkv, qkv, qkv, bsp, rsp, qkv],
        out_specs=(qkv, qkv, qkv, bsp),
        out_shape=(jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
                   jax.ShapeDtypeStruct((bw, h, n, d), k.dtype),
                   jax.ShapeDtypeStruct((bw, h, n, d), v.dtype),
                   jax.ShapeDtypeStruct((h, n, n), jnp.float32)),
    )(qt, kt, vt, bias_f, ridp, gt)


def packdot_probe(stage_cfg, dtype, iters, fetch):
    """Empirical check of the head-packing arithmetic above: raw QK^T dot at
    the stage shape, unpacked (K=32, quarter-rate) vs 4-head block-diagonal
    packed (K=128, full-rate, 4x MACs on zeros). Packing is given every
    advantage — the block-diagonal operand is PRE-BUILT outside the timed
    region (a real kernel would pay its construction every step)."""
    bw, n, h, d = (stage_cfg[k] for k in ("bw", "n", "h", "d"))
    pk = 128 // d  # heads packed per full contraction
    b = bw * h
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, n, d), dtype)
    k_ = jax.random.normal(rng, (b, d, n), dtype)
    # Packed layout: (b/pk, n, pk*d) q with heads concatenated on lanes;
    # block-diagonal K (b/pk, pk*d, pk*n).
    qp = q.reshape(b // pk, pk, n, d).transpose(0, 2, 1, 3).reshape(
        b // pk, n, pk * d)
    kbd = jnp.zeros((b // pk, pk * d, pk * n), dtype)
    kg = k_.reshape(b // pk, pk, d, n)
    for i in range(pk):
        kbd = kbd.at[:, i * d:(i + 1) * d, i * n:(i + 1) * n].set(kg[:, i])

    def unpacked(q, k_):
        return jax.lax.dot_general(
            q, k_, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def packed(qp, kbd):
        return jax.lax.dot_general(
            qp, kbd, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    # Same useful numbers both ways (packed output block i == unpacked head i).
    # Compare ON DEVICE — the full score tensors are ~2 GB each and the relay
    # moves ~25 MB/s; only the scalar relative error crosses the wire.
    @jax.jit
    def _relerr(q, k_, qp, kbd):
        i = 1  # spot-check one packed block
        a = unpacked(q, k_).reshape(b // pk, pk, n, n)[:, i]
        p = packed(qp, kbd)[:, :, i * n:(i + 1) * n]
        return jnp.max(jnp.abs(a - p)) / (jnp.max(jnp.abs(a)) + 1e-9)
    relerr = float(_relerr(q, k_, qp, kbd))
    assert relerr < 2e-2, f"packed block mismatch: relerr={relerr}"
    return {
        "unpacked_k32_ms": round(1e3 * chain_time(
            unpacked, (q, k_), iters, fetch), 3),
        "packed_k128_blockdiag_ms": round(1e3 * chain_time(
            packed, (qp, kbd), iters, fetch), 3),
    }


# ---------------------------------------------------------------- harness
def chain_time(fn, args, iters, fetch):
    """Chained fori_loop timing; returns seconds per iteration."""

    @jax.jit
    def chain(*args):
        def body(i, acc):
            out = fn(*args)
            leaves = jax.tree_util.tree_leaves(out)
            return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = chain(*args)
    fetch(r)  # compile+warm
    t0 = time.perf_counter()
    fetch(chain(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--stages", default="1,3")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--probe_only", action="store_true",
                    help="run only the head-packing raw-dot probe")
    args = ap.parse_args()

    from laryngeal_tpu.utils.compile_cache import enable
    from laryngeal_tpu.utils.profiling import block

    enable("/tmp/laryngeal_cc")
    fetch = lambda x: np.asarray(x)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    results = {}
    for stage in [int(s) for s in args.stages.split(",")]:
        cfg = STAGES[stage]
        bw, n, h, d = cfg["bw"], cfg["n"], cfg["h"], cfg["d"]
        rng = jax.random.PRNGKey(stage)
        ks = jax.random.split(rng, 6)
        q = jax.random.normal(ks[0], (bw, n, h, d), dtype)
        k = jax.random.normal(ks[1], (bw, n, h, d), dtype)
        v = jax.random.normal(ks[2], (bw, n, h, d), dtype)
        g = jax.random.normal(ks[3], (bw, n, h, d), dtype)
        bias = jax.random.normal(ks[4], (h, n, n), jnp.float32) * 0.1
        nw = 8  # shifted block: 8 distinct mask regions repeating over bw
        rid = jnp.asarray(
            np.random.default_rng(0).integers(0, 4, (nw, n)), jnp.int32)

        row = {}
        if args.probe_only:
            row["packdot"] = packdot_probe(cfg, dtype, args.iters, fetch)
            results[f"stage{stage}"] = row
            print(json.dumps({f"stage{stage}": row}), flush=True)
            continue
        # Correctness first: every variant vs the XLA fallback.
        ref = np.asarray(fwd_xla(q, k, v, bias, rid), np.float32)
        cur = np.asarray(WA.window_attention_pallas(q, k, v, bias, rid),
                         np.float32)
        assert np.abs(cur - ref).max() < 0.02, "current kernel mismatch"
        for kind in ("bf16sm", "exp2", "h2"):
            got = np.asarray(fwd_variant(q, k, v, bias, rid, kind), np.float32)
            err = np.abs(got - ref).max()
            row[f"{kind}_max_err"] = round(float(err), 5)

        row["fwd_xla_ms"] = round(1e3 * chain_time(
            fwd_xla, (q, k, v, bias, rid), args.iters, fetch), 3)
        row["fwd_current_ms"] = round(1e3 * chain_time(
            WA.window_attention_pallas, (q, k, v, bias, rid), args.iters,
            fetch), 3)
        for kind in ("bf16sm", "exp2", "h2"):
            row[f"fwd_{kind}_ms"] = round(1e3 * chain_time(
                functools.partial(fwd_variant, kind=kind),
                (q, k, v, bias, rid), args.iters, fetch), 3)

        row["bwd_nwin1_ms"] = round(1e3 * chain_time(
            functools.partial(WA._window_attention_bwd_impl, interpret=False),
            (q, k, v, bias, rid, g), args.iters, fetch), 3)
        try:
            row["bwd_nwin2_ms"] = round(1e3 * chain_time(
                bwd_nwin2, (q, k, v, bias, rid, g), args.iters, fetch), 3)
        except Exception as e:
            row["bwd_nwin2_ms"] = f"failed: {type(e).__name__}"

        row["packdot"] = packdot_probe(cfg, dtype, args.iters, fetch)

        results[f"stage{stage}"] = row
        print(json.dumps({f"stage{stage}": row}), flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
