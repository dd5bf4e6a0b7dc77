"""Host decode-stage profiler — where the e2e bottleneck's milliseconds go.

The round-3 headline bench is decode-bound (BASELINE.md: decode+scale ~32 ms
+ fDCT ~4.9 ms per clip vs 15 ms transfer / 13 ms compute). This script
breaks the host stage down on the real bench payloads, CPU-only (run it when
nothing else owns the single host core):

  - full-range decode cost (every frame up to last_needed) vs sampled count
  - rgb vs i420 output (colorspace conversion share)
  - sws identity-scale share (source 224x224 -> output 224x224)
  - native fDCT encode share
  - python-side glue (np.stack, sampler) share

Run:  timeout 600 python scripts/bench_host_decode.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_FRAMES = 32
CROP = 224
REPS = 3


def timed(fn, reps=REPS):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import bench
    from laryngeal_tpu.data import native
    from laryngeal_tpu.data.samplers import FrameSampler

    assert native.available(), "native cliploader required"
    paths = bench.ensure_videos()[:8]
    sampler = FrameSampler("random", NUM_FRAMES, seed=7)
    idx = {p: sampler(str(p), 96) for p in paths}
    all_idx = list(range(96))

    rows = []

    def bench_case(name, fn):
        dt = timed(fn) / len(paths)
        rows.append((name, dt * 1e3))
        print(f"{name:48s} {dt * 1e3:7.2f} ms/clip", flush=True)

    bench_case("decode 32 sampled -> i420 224",
               lambda: [native.decode_frames(p, idx[p], (CROP, CROP), "i420")
                        for p in paths])
    bench_case("decode 32 sampled -> rgb 224",
               lambda: [native.decode_frames(p, idx[p], (CROP, CROP), "rgb")
                        for p in paths])
    bench_case("decode ALL 96 -> i420 224",
               lambda: [native.decode_frames(p, all_idx, (CROP, CROP), "i420")
                        for p in paths])
    bench_case("decode 32 sampled -> i420 112 (half-size out)",
               lambda: [native.decode_frames(p, idx[p], (112, 112), "i420")
                        for p in paths])
    bench_case("decode first 32 only -> i420 224",
               lambda: [native.decode_frames(p, list(range(32)), (CROP, CROP),
                                             "i420") for p in paths])

    clips = [native.decode_frames(p, idx[p], (CROP, CROP), "i420")
             for p in paths]
    bench_case("fDCT encode q75 (native)",
               lambda: [native.dct_encode(c, 75) for c in clips])
    enc = [native.dct_encode(c, 75) for c in clips]
    bench_case("np.stack batch glue (dct tuple)",
               lambda: (np.stack([e[0] for e in enc]),
                        np.stack([e[1] for e in enc])))

    full = rows[0][1] + rows[5][1]
    print(f"\nserial host stage (decode+fDCT): {full:.2f} ms/clip "
          f"= {1e3 / full:.1f} clips/s")


if __name__ == "__main__":
    main()
