"""Interleaved A/B: progressive per-batch drain vs trailing-fetch-only.

NEGATIVE RESULT (kept as evidence). Hypothesis was that the axon relay
client only makes link/compute progress while a Python call is inside it,
so with the host core owned by GIL-released decode, every queued batch's
transfer+compute would cram into the single trailing ``np.asarray``
(stall_s ~0.7 of a 2.35 s pass). A drainer thread fetching each batch's
logits as dispatched (a progressive barrier) tests that.

Measured (3 ABBA pairs, one session, fresh seeds): nodrain median 18.81
[19.11, 18.81, 17.99] vs drain 18.77 [18.77, 19.61, 18.11] clips/s, stall
unchanged (~0.8 s both arms) — the relay DOES pump in background; the
drain is a no-op and bench.py keeps the single trailing fetch. The real
stall attribution is in ``scripts/bench_stall_probe.py``: the decoder
thread is the end-to-end critical path (never blocks on backpressure), and
its wall time exceeds its CPU time by ~0.5 s because the relay's transfer
work burns the same single host core from a separate process (invisible to
in-process ``time.thread_time`` accounting), plus a ~0.23 s tail fetch of
the last batch. The pass is host-CPU-bound at ~= decode CPU + relay CPU +
tail; the measured 19-20.5 clips/s sits within ~5% of that ceiling.

Usage: python scripts/bench_drain_ab.py [--pairs 3]
"""

import argparse
import json
import os
import queue
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
import numpy as np  # noqa: E402


def pass_with_optional_drain(paths, forward, params, seed, drain):
    """bench.bench_tpu's 3-stage pipeline + an optional drainer thread."""
    import jax
    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.preprocess.dct_wire import encode_clip

    sampler = FrameSampler("random", bench.NUM_FRAMES, seed=seed)
    q_dec: queue.Queue = queue.Queue(maxsize=4)
    q_dev: queue.Queue = queue.Queue(maxsize=4)
    q_out: queue.Queue = queue.Queue(maxsize=8)
    B = bench.BATCH
    cpu_s = {"decode": 0.0, "upload": 0.0}

    def stack_batch(batch):
        return (np.stack([b[0] for b in batch]),
                np.stack([b[1] for b in batch]))

    def decoder():
        batch = []
        t0 = time.thread_time()
        for p in paths:
            clip = decode_frames_auto(p, sampler(str(p), 96),
                                      resize_to=(bench.CROP, bench.CROP),
                                      fmt="i420")
            batch.append(encode_clip(clip, bench.DCT_QUALITY,
                                     bench.DCT_KEEP))
            if len(batch) == B:
                q_dec.put(stack_batch(batch))
                batch = []
        if batch:
            while len(batch) < B:
                batch.append(batch[-1])
            q_dec.put(stack_batch(batch))
        cpu_s["decode"] = time.thread_time() - t0
        q_dec.put(None)

    def uploader():
        t0 = time.thread_time()
        while True:
            item = q_dec.get()
            if item is None:
                break
            q_dev.put(jax.device_put(item))
        cpu_s["upload"] = time.thread_time() - t0
        q_dev.put(None)

    def drainer():
        while True:
            o = q_out.get()
            if o is None:
                break
            np.asarray(o)

    t0 = time.perf_counter()
    t_cpu_main0 = time.thread_time()
    threading.Thread(target=decoder, daemon=True).start()
    threading.Thread(target=uploader, daemon=True).start()
    drain_t = None
    if drain:
        drain_t = threading.Thread(target=drainer, daemon=True)
        drain_t.start()
    out = None
    while True:
        item = q_dev.get()
        if item is None:
            break
        out = forward(params, item)
        if drain:
            q_out.put(out)
    if drain:
        q_out.put(None)
        drain_t.join()
    np.asarray(out)
    wall = time.perf_counter() - t0
    cpu_main = time.thread_time() - t_cpu_main0
    stall = wall - cpu_s["decode"] - cpu_s["upload"] - cpu_main
    return len(paths) / wall, wall, stall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    args = ap.parse_args()

    from laryngeal_tpu.utils.compile_cache import enable
    enable(os.environ.get("BENCH_COMPILE_CACHE", "/tmp/laryngeal_cc"))

    paths = bench.ensure_videos()
    model, params = bench.build_model()
    forward = bench.make_forward(model)
    bench.warmup_relay(forward, params)

    results = {"nodrain": [], "drain": []}
    seed = 1
    for pair in range(args.pairs):
        order = (["nodrain", "drain"] if pair % 2 == 0
                 else ["drain", "nodrain"])
        for arm in order:
            v, wall, stall = pass_with_optional_drain(
                paths, forward, params, seed, drain=(arm == "drain"))
            seed += 1
            results[arm].append({"clips_per_sec": round(v, 2),
                                 "wall_s": round(wall, 2),
                                 "stall_s": round(stall, 2)})
            print(f"pair {pair} {arm}: {v:.2f} clips/s "
                  f"(wall {wall:.2f}s stall {stall:.2f}s)", flush=True)

    for arm, rows in results.items():
        vals = sorted(r["clips_per_sec"] for r in rows)
        print(f"{arm}: median {vals[len(vals) // 2]:.2f} "
              f"passes {[r['clips_per_sec'] for r in rows]}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
