"""Concurrent-client load benchmark for the inference server (round-3
VERDICT #8: "serve under load").

Serves a full-size ViViT-B int8 AOT artifact (infer/export.py) through
InferenceServer + DynamicBatcher and fires concurrent clients at
/predict (JSON video_path mode — decode runs in the handler threads, so
this measures the real end-to-end serving path: decode -> dynamic batch ->
device -> JSON). Reports p50/p95/mean latency and sustained req/s per
concurrency level, plus the batcher's fill/bucket stats.

Usage (on the TPU):
    LARYNGEAL_COMPILE_CACHE_DIR=/tmp/laryngeal_cc \
        python scripts/bench_serve_load.py [--clients 1,2,4,8] \
        [--requests 24] [--buckets 1,2,4,8] [--quantize int8]
"""

import argparse
import json
import sys
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", default="1,2,4,8,16,32")
    ap.add_argument("--requests", type=int, default=24,
                    help="total requests per concurrency level")
    ap.add_argument("--queue_depth", type=int, default=None,
                    help="bounded batcher queue (default 4x max bucket); "
                         "overloaded requests get 503 + Retry-After and are "
                         "reported as 'rejected' below")
    ap.add_argument("--request_timeout_ms", type=float, default=0.0,
                    help="per-request deadline (503 when exhausted queued)")
    ap.add_argument("--buckets", default="1,2,4,8")
    ap.add_argument("--quantize", default="int8", choices=["none", "int8"])
    ap.add_argument("--weights_dtype", default="bf16",
                    choices=["f32", "bf16"])
    ap.add_argument("--artifact", default=None,
                    help="reuse an existing .lxa instead of exporting")
    ap.add_argument("--live", default=None, metavar="WIRE",
                    help="serve a live checkpoint-backed Predictor on this "
                        "wire instead of an artifact (e.g. 'dctp' or "
                        "'dctp:l1' for lowres1) — serving is decode-bound, "
                        "so the lowres dct wire is the throughput lever")
    ap.add_argument("--batch_timeout_ms", type=float, default=30.0)
    args = ap.parse_args()

    import bench  # repo-root harness: bench videos + full-size model
    import threading

    from laryngeal_tpu.infer.export import (
        ExportedPredictor, export_predictor, save_exported)
    from laryngeal_tpu.serve.server import InferenceServer
    from laryngeal_tpu.utils import compile_cache

    compile_cache.enable()
    buckets = sorted(int(b) for b in args.buckets.split(","))
    paths = bench.ensure_videos()

    if args.live:
        import jax
        import jax.numpy as jnp

        from laryngeal_tpu.infer.predictor import Predictor
        from laryngeal_tpu.models.registry import get_model_spec
        from laryngeal_tpu.train.state import create_train_state

        wire, _, lspec = args.live.partition(":")
        lowres = int(lspec[1:]) if lspec.startswith("l") else 0
        model = bench.build_model()[0]
        spec = get_model_spec("vivit")
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, bench.NUM_FRAMES, bench.CROP, bench.CROP, 3),
                      jnp.float32),
            optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
        predictor = Predictor(model, spec, state,
                              num_frames=bench.NUM_FRAMES,
                              crop_size=bench.CROP, wire=wire,
                              wire_quality=75, wire_keep_ac=15,
                              wire_pack_from=8, wire_lowres=lowres)
        print(f"live predictor: wire={wire} lowres={lowres}", flush=True)
        art_path = None
    elif args.artifact:
        art_path = Path(args.artifact)
    else:
        from laryngeal_tpu.infer.predictor import Predictor
        from laryngeal_tpu.models.registry import get_model_spec
        from laryngeal_tpu.train.state import create_train_state

        import jax
        import jax.numpy as jnp

        print("exporting full-size ViViT-B artifact "
              f"(buckets {buckets}, {args.quantize})...", flush=True)
        model = bench.build_model()[0]
        spec = get_model_spec("vivit")
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, bench.NUM_FRAMES, bench.CROP, bench.CROP, 3),
                      jnp.float32),
            optimizer=spec.optimizer, learning_rate=1e-3, weight_decay=0.01)
        pred = Predictor(model, spec, state, num_frames=bench.NUM_FRAMES,
                         crop_size=bench.CROP)
        art = export_predictor(
            pred, batch_sizes=tuple(buckets),
            quantize=None if args.quantize == "none" else args.quantize,
            weights_dtype=args.weights_dtype)
        art_path = save_exported(art, Path("/tmp/serve_load_vivit.lxa"))
        print(f"artifact: {art_path} "
              f"({art_path.stat().st_size / 1e6:.1f} MB)", flush=True)

    if art_path is not None:
        predictor = ExportedPredictor.load(art_path)
    # Pay compile + relay session warmup per bucket before timing.
    rng = np.random.default_rng(0)
    for b in sorted(set(buckets), reverse=True):
        warm = rng.integers(0, 256, (b, predictor.num_frames,
                                     predictor.crop_size,
                                     predictor.crop_size, 3), dtype=np.uint8)
        np.asarray(predictor.predict_clip(warm))
        print(f"warm bucket B={b}", flush=True)

    srv = InferenceServer(predictor, port=0, max_batch=max(buckets),
                          batch_timeout_ms=args.batch_timeout_ms,
                          bucket_sizes=buckets,
                          queue_depth=args.queue_depth,
                          request_timeout_ms=args.request_timeout_ms)
    threading.Thread(target=srv.httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=300) as r:
            return json.loads(r.read())

    import urllib.error

    def predict_one(video):
        """Returns (latency_s, http_code, retry_after_or_None)."""
        body = json.dumps({"video_path": str(video)}).encode()
        req = urllib.request.Request(
            base + "/predict", data=body,
            headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                json.loads(r.read())
                return time.perf_counter() - t0, r.status, None
        except urllib.error.HTTPError as e:
            return (time.perf_counter() - t0, e.code,
                    e.headers.get("Retry-After"))

    assert get("/healthz")["status"] == "ok"
    assert predict_one(paths[0])[1] == 200  # prime the decode path

    results = {}
    for n_clients in (int(c) for c in args.clients.split(",")):
        before = get("/stats")
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_clients) as pool:
            futs = [pool.submit(predict_one, paths[i % len(paths)])
                    for i in range(args.requests)]
            outs = [f.result() for f in futs]
        wall = time.perf_counter() - t0
        after = get("/stats")
        lat = sorted(t for t, code, _ in outs if code == 200)
        n_ok = len(lat)
        n_rej = sum(1 for _, code, _ in outs if code == 503)
        row = {
            "clients": n_clients,
            "requests": args.requests,
            "ok": n_ok,
            "rejected_503": n_rej,
            "req_per_sec": round(n_ok / wall, 2),
            "p50_ms": round(1e3 * lat[len(lat) // 2], 1) if lat else None,
            "p95_ms": (round(1e3 * lat[max(int(len(lat) * 0.95) - 1, 0)], 1)
                       if lat else None),
            "mean_ms": (round(1e3 * sum(lat) / len(lat), 1) if lat else None),
            "batches": after["batches"] - before["batches"],
            "mean_fill": round((after["mean_batch_fill"] * after["batches"]
                                - before["mean_batch_fill"]
                                * before["batches"])
                               / max(after["batches"] - before["batches"],
                                     1), 2),
        }
        results[n_clients] = row
        print(json.dumps(row), flush=True)

    print(json.dumps({"bucket_dispatches":
                      get("/stats")["bucket_dispatches"]}))
    srv.close()


if __name__ == "__main__":
    main()
