"""Attention-only A/B at TimeSformer's divided-attention shapes (real TPU).

Times the short-sequence kernel (`ops/short_attention.py`, including the
packed tiny-N layout) against `jax.nn.dot_product_attention` at the exact
batch-head/sequence shapes TimeSformer-B issues at B8 32f 224^2:

  temporal: (B*spatial, T)   = (1576, 32),  12 heads, d=64
  spatial:  (B*T, N_patches) = (256, 197),  12 heads, d=64

Dependence-chained harness (carry -> input) so XLA cannot hoist; bf16.

Usage: python scripts/bench_short_attn_op.py [--iters 30]
"""

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

from laryngeal_tpu.ops.short_attention import short_attention


def chain(fn, args, iters):
    @jax.jit
    def run(*a):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur, *a[1:])
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return acc + bump, a[0] + bump.astype(a[0].dtype)
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), a[0]))
        return acc

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.dtype(args.dtype)

    shapes = {"temporal": (1576, 32, 12, 64), "spatial": (256, 197, 12, 64)}
    for name, shape in shapes.items():
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q, k, v = (jax.random.normal(kk, shape, dtype) for kk in ks)
        g = jax.random.normal(jax.random.PRNGKey(1), shape, dtype)

        impls = {
            "xla": jax.nn.dot_product_attention,
            "kernel": functools.partial(short_attention, interpret=False),
        }
        row = {}
        for iname, fn in impls.items():
            fwd_ms = 1e3 * chain(fn, (q, k, v), args.iters)

            def fwd_bwd(qq, kk, vv, _fn=fn):
                def loss(t):
                    return jnp.sum(_fn(*t).astype(jnp.float32) *
                                   g.astype(jnp.float32))
                gr = jax.grad(loss)((qq, kk, vv))
                return sum(jnp.sum(t.astype(jnp.float32)) for t in gr)

            fb_ms = 1e3 * chain(fwd_bwd, (q, k, v), args.iters)
            row[iname] = {"fwd_ms": round(fwd_ms, 3),
                          "fwd_bwd_ms": round(fb_ms, 3)}
        row["fwd_speedup"] = round(row["xla"]["fwd_ms"] /
                                   row["kernel"]["fwd_ms"], 3)
        row["fwd_bwd_speedup"] = round(row["xla"]["fwd_bwd_ms"] /
                                       row["kernel"]["fwd_bwd_ms"], 3)
        print(json.dumps({name: row}), flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
