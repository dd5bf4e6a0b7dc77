"""Training-feed wire A/B on the chip: rgb vs i420 vs dct end-to-end.

Measures FULL training throughput (host decode -> wire encode -> device_put
-> jitted train step, stages overlapped like bench.bench_tpu) for the wire
formats the training feed supports (data/dataset.py::VideoDataset(wire=...)).
The compute-only train rate bounds what any wire can reach; the RGB24 wire
ships 4.8 MB/clip (vs 2.4 i420 / ~1.2 dct-keep31), so on relay-class links
the feed is the bottleneck and the wire choice is the lever.

ABBA arm order within one session so relay drift hits all arms equally.
Run:  timeout 2400 python scripts/bench_train_wire.py [--passes 2]
"""

from __future__ import annotations

import argparse
import queue
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

NUM_FRAMES = 32
CROP = 224
BATCH = 8
N_CLIPS = 24


def build_state_and_steps(wire: str):
    """`wire` is a bench-style spec: plain name or e.g. dctp@q75k15p8l1
    (bench.wire_params / bench.wire_lowres parse it; the l<n> suffix rides
    the wire at CROP>>n geometry — the round-4 lowres lever on training)."""
    import jax
    import jax.numpy as jnp

    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.train.state import create_train_state
    from laryngeal_tpu.train.steps import make_train_step
    import bench

    kind, q, keep, _ = bench.wire_params(wire)
    hw = CROP >> bench.wire_lowres(wire)
    spec = get_model_spec("vivit")
    model, _ = bench.build_model()
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((1, NUM_FRAMES, CROP, CROP, 3), jnp.float32),
        optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
    step = make_train_step(
        model, spec.preprocess_regime, spec.loss, crop=CROP, wire=kind,
        wire_hw=(hw, hw) if kind in ("dct", "dctp") else None,
        wire_quality=q, wire_keep_ac=keep)
    return state, step


def encode(clip_i420: np.ndarray, wire: str):
    import bench

    kind, q, keep, pack = bench.wire_params(wire)
    if kind == "rgb":
        raise AssertionError("rgb arm decodes rgb directly")
    if kind == "i420":
        return clip_i420
    if kind == "dctp":
        from laryngeal_tpu.preprocess.dct_wire import encode_clip_packed

        return encode_clip_packed(clip_i420, q, keep, pack)
    if kind == "dct":
        from laryngeal_tpu.preprocess.dct_wire import encode_clip

        return encode_clip(clip_i420, q, keep)
    raise ValueError(wire)


def run_pass(paths, state, step, wire: str, seed: int):
    """One overlapped pass; returns (clips/s, new_state)."""
    import jax

    from laryngeal_tpu.data.native import decode_frames_auto
    from laryngeal_tpu.data.samplers import FrameSampler

    sampler = FrameSampler("random", NUM_FRAMES, seed=seed)
    q_dec: "queue.Queue" = queue.Queue(maxsize=3)
    q_dev: "queue.Queue" = queue.Queue(maxsize=3)

    import bench

    kind = bench.wire_params(wire)[0]
    lr = bench.wire_lowres(wire)
    hw = CROP >> lr

    def decoder():
        batch = []
        try:
            for p in paths:
                if kind == "rgb":
                    clip = decode_frames_auto(p, sampler(str(p), 96),
                                              resize_to=(CROP, CROP))
                else:
                    clip = encode(decode_frames_auto(
                        p, sampler(str(p), 96), resize_to=(hw, hw),
                        fmt="i420", lowres=lr), wire)
                batch.append(clip)
                if len(batch) == BATCH:
                    if isinstance(batch[0], tuple):
                        q_dec.put(tuple(
                            np.stack([b[k] for b in batch])
                            for k in range(len(batch[0]))))
                    else:
                        q_dec.put(np.stack(batch))
                    batch = []
        finally:
            q_dec.put(None)

    def uploader():
        try:
            while True:
                item = q_dec.get()
                if item is None:
                    break
                q_dev.put(jax.device_put(item))
        finally:
            q_dev.put(None)

    rng = jax.random.PRNGKey(seed)
    labels = jax.device_put(np.tile([0, 1], BATCH // 2).astype(np.int32))
    mask = jax.device_put(np.ones((BATCH,), np.bool_))

    t0 = time.perf_counter()
    threading.Thread(target=decoder, daemon=True).start()
    threading.Thread(target=uploader, daemon=True).start()
    metrics = None
    n = 0
    while True:
        item = q_dev.get()
        if item is None:
            break
        state, metrics = step(state, item, labels, mask, rng)
        n += BATCH
    # Host fetch = the only reliable barrier through the relay.
    loss = float(np.asarray(metrics["loss"]))
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss
    return n / dt, state


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--arms", type=str, default="rgb,i420,dct")
    args = ap.parse_args()

    import jax
    import bench
    from laryngeal_tpu.utils.compile_cache import enable as cc

    cc("/tmp/laryngeal_cc")
    paths = bench.ensure_videos()[:N_CLIPS]
    arms = [a.strip() for a in args.arms.split(",") if a.strip()]

    states, steps = {}, {}
    for w in arms:
        states[w], steps[w] = build_state_and_steps(w)

    # Session warmup (large random payload) + per-arm compile on a tiny run.
    rng = np.random.default_rng(0)
    warm = rng.integers(0, 255, (BATCH, NUM_FRAMES, CROP, CROP, 3),
                        dtype=np.uint8)
    t0 = time.perf_counter()
    np.asarray(jax.device_put(warm)[0, 0, 0, 0, :4])
    print(f"# relay warmup {time.perf_counter() - t0:.1f}s", flush=True)
    for w in arms:
        t0 = time.perf_counter()
        r, states[w] = run_pass(paths[:BATCH], states[w], steps[w], w, seed=1)
        print(f"# compile+first {w}: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {w: [] for w in arms}
    for i in range(args.passes):
        order = arms if i % 2 == 0 else arms[::-1]
        for w in order:
            r, states[w] = run_pass(paths, states[w], steps[w], w, seed=10 + i)
            results[w].append(round(r, 2))
            print(f"train e2e {w}: {r:.2f} clips/s", flush=True)
    for w, v in results.items():
        print(f"{w}: passes {v} median {sorted(v)[len(v) // 2]}", flush=True)


if __name__ == "__main__":
    main()
