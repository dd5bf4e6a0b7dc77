"""Whole-model A/B: TimeSformer "flat" (HF-parity) vs "nt" (transpose-free)
layout (round-3 VERDICT #7 probe).

The flat layout pays two materialized (B,N,T,D)<->(B,T,N,D) transposes plus
a tiled-cls concat per layer in the spatial block (measured 106.7 ms of
which only ~4.5 ms/layer is the attention core — BASELINE.md post-kernel
ablation). The "nt" layout (models/timesformer.py TimesformerLayerNT)
carries (cls, (B,N,T,D)) and fuses cls into the spatial attention as an
extra einsum score column — zero transposes. Numerics pinned identical in
tests/test_timesformer_layout.py; this script measures whether the layout
actually buys whole-model time on the TPU, and re-tests whether the
temporal short-attention kernel's op-level 1.8x materializes once the
layout context changes (pallas vs xla under BOTH layouts).

Usage (on the TPU):
    LARYNGEAL_COMPILE_CACHE_DIR=/tmp/laryngeal_cc \
        python scripts/bench_timesformer_layout.py [--frames 32] [--batch 8] [--train]
"""

import argparse
import dataclasses
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

from bench_mfu_ablation import chain_time_dep, flops_of, PEAK_TFLOPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--impls", default="pallas,xla")
    args = ap.parse_args()

    from laryngeal_tpu.ops import attention as A
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)
    from laryngeal_tpu.utils import compile_cache

    compile_cache.enable()

    base = TimesformerConfig(num_frames=args.frames, num_classes=2,
                             dtype=jnp.bfloat16)
    x = jnp.zeros((args.batch, args.frames, 224, 224, 3), jnp.bfloat16)
    params = TimesformerForVideoClassification(base).init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.frames, 224, 224, 3), jnp.float32))["params"]

    out = {}
    for layout in ("flat", "nt"):
        cfg = dataclasses.replace(base, layout=layout)
        model = TimesformerForVideoClassification(cfg)
        train_model = TimesformerForVideoClassification(
            dataclasses.replace(cfg, remat=args.frames >= 32))

        def fwd(p, xx):
            return model.apply({"params": p}, xx)

        def train_obj(p, xx):
            def loss(pp):
                logits = train_model.apply({"params": pp}, xx)
                return jnp.mean(
                    (logits - jnp.ones_like(logits)) ** 2).astype(jnp.float32)
            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(t.astype(jnp.float32)) * 0.0
                           for t in jax.tree_util.tree_leaves(g))

        for impl in args.impls.split(","):
            A.set_attention_impl(impl)
            row = {}
            ms = 1e3 * chain_time_dep(fwd, params, x, args.iters)
            gf = flops_of(fwd, params, x) / 1e9
            row["fwd_ms"] = round(ms, 2)
            row["fwd_clips_per_sec"] = round(args.batch / (ms / 1e3), 1)
            row["fwd_mfu_pct"] = round(100 * gf / ms / PEAK_TFLOPS, 1)
            if args.train:
                tms = 1e3 * chain_time_dep(train_obj, params, x, args.iters)
                row["train_ms"] = round(tms, 2)
                row["train_clips_per_sec"] = round(
                    args.batch / (tms / 1e3), 1)
            out[f"{layout}/{impl}"] = row
            print(json.dumps({f"{layout}/{impl}": row}), flush=True)
            jax.clear_caches()

    best_flat = min(v["fwd_ms"] for k, v in out.items()
                    if k.startswith("flat/"))
    best_nt = min(v["fwd_ms"] for k, v in out.items() if k.startswith("nt/"))
    print(json.dumps({"fwd_speedup_nt_over_flat": round(
        best_flat / best_nt, 3)}))
    if args.train:
        tf = min(v["train_ms"] for k, v in out.items()
                 if k.startswith("flat/"))
        tn = min(v["train_ms"] for k, v in out.items()
                 if k.startswith("nt/"))
        print(json.dumps({"train_speedup_nt_over_flat": round(tf / tn, 3)}))


if __name__ == "__main__":
    main()
