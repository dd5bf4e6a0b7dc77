"""Piecewise probe of the 3D-ResNet50 stem after the s2d rewrite.

BASELINE.md round 3: the s2d stem cut the whole stem (conv+BN+relu+maxpool)
from ~30.5 to ~12 ms, but that is still ~1/3 of the model's runtime at low
MXU utilization (the conv has 64 output lanes and C_in=12). This probe
times each piece in isolation (dependence-chained) to locate the残 cost:

  - s2d conv alone            (contraction 3*4*4*12 = 576, N=64)
  - spatial-paired conv       (adjacent W outputs stacked into N=128 via a
                               5-tap stride-2 window: 1.25x MACs at 2x
                               lane utilization, ceiling 1.6x; measured
                               here BEFORE committing to model surgery)
  - BN+relu alone, maxpool alone

Usage: python scripts/bench_resnet3d_stem.py [--iters 20]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, x, iters):
    @jax.jit
    def run(xx):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur)
            bump = jnp.sum(out.astype(jnp.float32)) * 1e-12
            return acc + bump, xx + bump.astype(xx.dtype)
        acc, _ = jax.lax.fori_loop(0, iters, body, (jnp.float32(0), xx))
        return acc

    np.asarray(run(x))
    t0 = time.perf_counter()
    np.asarray(run(x))
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    b, t, hh, ww = 8, 32, 224, 224
    key = jax.random.PRNGKey(0)
    kernel = jax.random.normal(key, (3, 7, 7, 3, 64), jnp.bfloat16) * 0.1
    x = jax.random.normal(jax.random.PRNGKey(1), (b, t, hh, ww, 3),
                          jnp.bfloat16)

    # --- s2d conv as shipped (models/resnet3d.py::_StemConv) -------------
    def s2d_conv(x):
        bb, tt, h, w, c = x.shape
        xs = x.reshape(bb, tt, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            bb, tt, h // 2, w // 2, 4 * c)
        kr = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        kr = kr.reshape(3, 4, 2, 4, 2, c, 64)
        kr = kr.transpose(0, 1, 3, 2, 4, 5, 6).reshape(3, 4, 4, 4 * c, 64)
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, kr.shape, ("NDHWC", "DHWIO", "NDHWC"))
        return jax.lax.conv_general_dilated(
            xs, kr, window_strides=(1, 1, 1),
            padding=[(1, 1), (2, 1), (2, 1)], dimension_numbers=dn)

    # --- spatial-pair packed conv (N=128) --------------------------------
    # Adjacent W outputs y[..,2r] and y[..,2r+1] stacked into 128 output
    # channels: the s2d conv's 4-tap W window (pad (2,1)) becomes a 5-tap
    # stride-2 window, K5[j5, e-block] = w[j5 - e] for 0 <= j5-e < 4.
    # 1.25x MACs (5/4 taps), 2x output-lane utilization.
    def pair_conv(x):
        bb, tt, h, w, c = x.shape
        xs = x.reshape(bb, tt, h // 2, 2, w // 2, 2, c)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            bb, tt, h // 2, w // 2, 4 * c)
        kr = jnp.pad(kernel, ((0, 0), (1, 0), (1, 0), (0, 0), (0, 0)))
        kr = kr.reshape(3, 4, 2, 4, 2, c, 64)
        kr = kr.transpose(0, 1, 3, 2, 4, 5, 6).reshape(3, 4, 4, 4 * c, 64)
        kp = jnp.zeros((3, 4, 5, 4 * c, 2, 64), kr.dtype)
        for e in range(2):
            for j5 in range(5):
                if 0 <= j5 - e < 4:
                    kp = kp.at[:, :, j5, :, e, :].set(kr[:, :, j5 - e])
        kp = kp.reshape(3, 4, 5, 4 * c, 128)
        dn = jax.lax.conv_dimension_numbers(
            xs.shape, kp.shape, ("NDHWC", "DHWIO", "NDHWC"))
        y = jax.lax.conv_general_dilated(
            xs, kp, window_strides=(1, 1, 2),
            padding=[(1, 1), (2, 1), (2, 2)], dimension_numbers=dn)
        # (B, T, H', W'/2, (e,64)) -> (B, T, H', W', 64)
        bb2, tm, hp, wq, _ = y.shape
        return y.reshape(bb2, tm, hp, wq, 2, 64).reshape(
            bb2, tm, hp, wq * 2, 64)

    y0 = s2d_conv(x)
    y1 = pair_conv(x)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32) -
                                y1.astype(jnp.float32))))
    print(json.dumps({"pair_conv_max_abs_err": err}), flush=True)

    stem_out = y0
    scale = jax.random.normal(jax.random.PRNGKey(2), (64,), jnp.bfloat16)

    def bn_relu(y):
        return jax.nn.relu(y * scale + scale)

    def pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 3, 3, 1), (1, 1, 2, 2, 1),
            [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])

    rows = {}
    rows["s2d_conv"] = round(chain(s2d_conv, x, args.iters), 2)
    rows["pair_conv"] = round(chain(pair_conv, x, args.iters), 2)
    rows["bn_relu"] = round(chain(bn_relu, stem_out, args.iters), 2)
    rows["maxpool"] = round(chain(pool, stem_out, args.iters), 2)
    print(json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
