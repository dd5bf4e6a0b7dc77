"""Whole-model A/B for the short-sequence attention kernel (TimeSformer).

Measures the full TimeSformer-B forward and train step on the real TPU with
``LARYNGEAL_ATTN_IMPL`` = xla vs pallas. With the round-3 router
(`ops/attention.py`), the only difference between the two impls at
TimeSformer shapes is the spatial N=197 attention core: pallas routes it to
`ops/short_attention.py` (temporal N=32 stays on XLA either way).

Usage (on the TPU, compile cache recommended):
    LARYNGEAL_COMPILE_CACHE_DIR=/tmp/laryngeal_cc \
        python scripts/bench_short_attn_model.py [--frames 32] [--batch 8]

Reference parity: accelerates the HF TimeSformer forward
(/root/reference/timesformer/main.py defaults) numerics-unchanged.
"""

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from bench_mfu_ablation import chain_time_dep, flops_of, PEAK_TFLOPS


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--train", action="store_true",
                    help="also measure the jitted train step (remat)")
    args = ap.parse_args()

    from laryngeal_tpu.ops import attention as A
    from laryngeal_tpu.models.timesformer import (
        TimesformerConfig, TimesformerForVideoClassification)
    from laryngeal_tpu.utils import compile_cache

    compile_cache.enable()

    cfg = TimesformerConfig(num_frames=args.frames, num_classes=2,
                            dtype=jnp.bfloat16)
    model = TimesformerForVideoClassification(cfg)
    # Per-layer remat for the backward (matches cli.main's auto-remat at
    # the 32f single-chip HBM cliff); fwd-only timing uses the plain model.
    train_model = TimesformerForVideoClassification(
        dataclasses.replace(cfg, remat=args.frames >= 32))
    x = jnp.zeros((args.batch, args.frames, 224, 224, 3), jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, args.frames, 224, 224, 3), jnp.float32))["params"]

    def fwd(p, xx):
        return model.apply({"params": p}, xx)

    def train_obj(p, xx):
        def loss(pp):
            logits = train_model.apply({"params": pp}, xx)
            return jnp.mean(
                (logits - jnp.ones_like(logits)) ** 2).astype(jnp.float32)
        l, g = jax.value_and_grad(loss)(p)
        # Fold grads into a scalar so the chained harness carries a bump.
        return l + sum(jnp.sum(t.astype(jnp.float32)) * 0.0
                       for t in jax.tree_util.tree_leaves(g))

    out = {}
    for impl in ("xla", "pallas"):
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
            row["train_clips_per_sec"] = round(args.batch / (tms / 1e3), 1)
        out[impl] = row
        print(json.dumps({impl: row}), flush=True)
        jax.clear_caches()

    speed = out["xla"]["fwd_ms"] / out["pallas"]["fwd_ms"]
    print(json.dumps({"fwd_speedup_pallas_over_xla": round(speed, 3)}))
    if args.train:
        ts = out["xla"]["train_ms"] / out["pallas"]["train_ms"]
        print(json.dumps({"train_speedup_pallas_over_xla": round(ts, 3)}))


if __name__ == "__main__":
    main()
