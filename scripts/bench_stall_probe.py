"""Timeline probe: where does the ~0.8 s e2e-pass "stall" go?

Times every blocking point of bench.py's 3-stage pipeline: decoder's
q_dec.put (backpressure), uploader's q_dec.get (starvation) and device_put
call, main's q_dev.get, final fetch.

Measured (3 passes, one session, BENCH defaults):
  seed 101: 20.06 clips/s wall 2.39s | dec_put_block=0.02 up_get_block=1.99
            up_put_call=0.12 main_get_block=2.11 final_fetch=0.23
            dec_done=2.14
(passes 102/103 within 5%). Attribution: the decoder thread is the
end-to-end critical path (dec_done ~= wall - final_fetch) and NEVER blocks
on backpressure; the uploader starves waiting on it. Decode wall (2.14 s)
exceeds decode CPU (1.57 s, time.thread_time) by ~0.5 s — the relay
client's transfer work (hashing/compressing the ~58 MB payload) runs in a
separate process on the SAME single host core, stealing cycles invisibly
to in-process accounting. So bench.py's stall_s = relay-process CPU + the
~0.23 s last-batch tail fetch, and e2e is host-CPU-bound at
~= decode CPU + relay CPU + tail (~21 clips/s ceiling for this payload;
measured passes are within ~5% of it). See scripts/bench_drain_ab.py for
the refuted pump-starvation hypothesis.
"""
import os
import queue
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402
import numpy as np  # noqa: E402


def run_pass(paths, forward, params, seed):
    import jax
    from laryngeal_tpu.data.samplers import FrameSampler
    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.preprocess.dct_wire import encode_clip

    sampler = FrameSampler("random", bench.NUM_FRAMES, seed=seed)
    q_dec: queue.Queue = queue.Queue(maxsize=4)
    q_dev: queue.Queue = queue.Queue(maxsize=4)
    B = bench.BATCH
    tl = {"dec_put_block": 0.0, "up_get_block": 0.0, "up_put_call": 0.0,
          "up_qput_block": 0.0, "main_get_block": 0.0, "final_fetch": 0.0,
          "dec_done": 0.0, "up_done": 0.0}

    def stack_batch(batch):
        return (np.stack([b[0] for b in batch]),
                np.stack([b[1] for b in batch]))

    t0 = time.perf_counter()

    def decoder():
        batch = []
        for p in paths:
            clip = decode_frames_auto(p, sampler(str(p), 96),
                                      resize_to=(bench.CROP, bench.CROP),
                                      fmt="i420")
            clip = encode_clip(clip, bench.DCT_QUALITY, bench.DCT_KEEP)
            batch.append(clip)
            if len(batch) == B:
                t = time.perf_counter()
                q_dec.put(stack_batch(batch))
                tl["dec_put_block"] += time.perf_counter() - t
                batch = []
        if batch:
            while len(batch) < B:
                batch.append(batch[-1])
            q_dec.put(stack_batch(batch))
        q_dec.put(None)
        tl["dec_done"] = time.perf_counter() - t0

    def uploader():
        import jax
        while True:
            t = time.perf_counter()
            item = q_dec.get()
            tl["up_get_block"] += time.perf_counter() - t
            if item is None:
                break
            t = time.perf_counter()
            d = jax.device_put(item)
            tl["up_put_call"] += time.perf_counter() - t
            t = time.perf_counter()
            q_dev.put(d)
            tl["up_qput_block"] += time.perf_counter() - t
        q_dev.put(None)
        tl["up_done"] = time.perf_counter() - t0

    threading.Thread(target=decoder, daemon=True).start()
    threading.Thread(target=uploader, daemon=True).start()
    out = None
    while True:
        t = time.perf_counter()
        item = q_dev.get()
        tl["main_get_block"] += time.perf_counter() - t
        if item is None:
            break
        out = forward(params, item)
    t = time.perf_counter()
    np.asarray(out)
    tl["final_fetch"] = time.perf_counter() - t
    wall = time.perf_counter() - t0
    rate = len(paths) / wall
    print(f"seed {seed}: {rate:.2f} clips/s wall {wall:.2f}s | "
          + " ".join(f"{k}={v:.2f}" for k, v in tl.items()), flush=True)


def main():
    from laryngeal_tpu.utils.compile_cache import enable
    enable("/tmp/laryngeal_cc")
    paths = bench.ensure_videos()
    model, params = bench.build_model()
    forward = bench.make_forward(model)
    bench.warmup_relay(forward, params)
    for seed in (101, 102, 103):
        run_pass(paths, forward, params, seed)


if __name__ == "__main__":
    main()
