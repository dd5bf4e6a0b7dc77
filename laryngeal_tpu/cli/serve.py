"""Serving CLI — online HTTP inference with dynamic batching.

``python -m laryngeal_tpu.cli.serve --model vivit --model_path CKPT [--port N]``

Loads a training/ported checkpoint into the single jitted forward graph
(``infer.predictor.Predictor``) and serves it; see ``serve/server.py`` for
the endpoint contract. Model/architecture flags mirror the inference CLI.
"""

from __future__ import annotations

import argparse


def build_parser(model_default=None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native laryngeal video inference server")
    p.add_argument("--model", type=str, default=model_default,
                   choices=["vivit", "timesformer", "resnet3d", "resnet50_lstm", "swin3d"],
                   required=False)
    p.add_argument("--model_path", "--checkpoint_path", dest="model_path",
                   type=str, default=None, help="Checkpoint dir (orbax) from training")
    p.add_argument("--exported", type=str, default=None,
                   help="Serve an AOT artifact (cli.export output) — no "
                        "model code or checkpoint needed; overrides "
                        "--model/--model_path")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8008, help="0 picks a free port")
    p.add_argument("--max_batch", type=int, default=8,
                   help="Dynamic-batching window — also the largest compiled batch shape")
    p.add_argument("--batch_buckets", type=str, default=None,
                   help="Comma-separated compiled batch shapes "
                        "(e.g. '1,4,8'): each dispatch pads to the smallest "
                        "bucket that fits instead of always max_batch — "
                        "lower latency at low concurrency for one extra "
                        "compile per bucket (all pre-warmed at startup)")
    p.add_argument("--batch_timeout_ms", type=float, default=30.0,
                   help="Max wait to fill a batch before dispatching")
    p.add_argument("--decode_threads", type=int, default=None,
                   help="Concurrent host video decodes admitted (default: "
                        "cpu count) — excess requests queue instead of "
                        "thrashing the decode cores")
    p.add_argument("--queue_depth", type=int, default=None,
                   help="Bound on queued (decoded) requests awaiting the "
                        "device (default 4x max_batch; 0 = unbounded). A "
                        "full queue answers 503 + Retry-After instead of "
                        "growing memory/latency without bound")
    p.add_argument("--request_timeout_ms", type=float, default=0.0,
                   help="Per-request deadline: requests that exhaust it "
                        "waiting for decode capacity or in the device queue "
                        "get 503 + Retry-After instead of stale answers "
                        "(0 = no deadline)")
    p.add_argument("--max_upload_mb", type=float, default=512.0,
                   help="Reject /predict bodies larger than this (MB)")
    p.add_argument("--data_root", type=str, default=None,
                   help="Restrict path-based /predict requests to videos "
                        "under this directory (recommended whenever --host "
                        "is not loopback)")
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--sampling_method", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--model_size", type=str, default="tiny")
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--wire", type=str, default="rgb",
                   choices=("rgb", "i420", "delta", "dct", "dctp"),
                   help="host->device payload format for the clip transfer "
                        "(checkpoint-backed predictor only; dct/dctp are "
                        "lossy transform-coded wires — drift pinned in "
                        "BASELINE.md)")
    p.add_argument("--wire_quality", type=int, default=75)
    p.add_argument("--wire_keep_ac", type=int, default=31)
    p.add_argument("--wire_pack_from", type=int, default=14)
    p.add_argument("--wire_lowres", type=int, default=0,
                   help="non-rgb wires: decode the source at 1/2**n "
                        "resolution (native mpeg4 lowres) and carry the "
                        "reduced geometry through the wire - ~4x less "
                        "decode transform work; lossy, drift pinned in "
                        "BASELINE.md round-4 lowres study")
    p.add_argument("--compile_cache_dir", type=str, default=None,
                   help="Persistent XLA compilation cache (also via "
                        "LARYNGEAL_COMPILE_CACHE_DIR) — restarts of the "
                        "server skip the serving-shape compile")
    return p


def main(argv=None, model_default=None):
    args = build_parser(model_default).parse_args(argv)

    # Validate bucket sizes FIRST: each bucket costs a full-size remote
    # compile in the warmup loop (minutes through the relay), and
    # DynamicBatcher would reject bad sizes only after all are paid.
    if args.batch_buckets:
        try:
            buckets = [int(b) for b in args.batch_buckets.split(",")]
        except ValueError:
            raise SystemExit(
                f"--batch_buckets must be comma-separated integers "
                f"(e.g. '1,4,8'); got {args.batch_buckets!r}")
    else:
        buckets = [args.max_batch]
    bad = [b for b in buckets if b < 1 or b > args.max_batch]
    if bad:
        raise SystemExit(
            f"--batch_buckets entries {bad} outside [1, --max_batch="
            f"{args.max_batch}]; raise --max_batch or drop the bucket")
    if max(buckets) < args.max_batch:
        buckets.append(args.max_batch)

    from ..serve.server import InferenceServer
    from ..utils.compile_cache import enable as enable_compile_cache
    from ..utils.logger import ExperimentLogger

    enable_compile_cache(args.compile_cache_dir)
    prefix = f"{args.model or 'exported'}-serve"
    exp_logger = ExperimentLogger(args.log_dir, prefix=prefix)
    logger = exp_logger.get_logger()

    if args.exported:
        from ..infer.export import ExportedPredictor

        predictor = ExportedPredictor.load(args.exported, logger=logger)
    else:
        if not args.model or not args.model_path:
            raise SystemExit("--model and --model_path are required "
                             "without --exported")
        from ..infer.predictor import Predictor

        predictor = Predictor.from_checkpoint(
            model_name=args.model,
            checkpoint_path=args.model_path,
            num_frames=args.num_frames,
            sampling_method=args.sampling_method,
            num_classes=args.num_classes,
            crop_size=args.crop_size,
            image_size=args.image_size,
            model_size=args.model_size,
            hidden_size=args.hidden_size,
            num_layers=args.num_layers,
            logger=logger,
            wire=args.wire,
            wire_quality=args.wire_quality,
            wire_keep_ac=args.wire_keep_ac,
            wire_pack_from=args.wire_pack_from,
            wire_lowres=args.wire_lowres,
        )
    # Compile the serving shape AND pay the relay's first-large-transfer
    # session warmup before accepting traffic (random bytes, not zeros —
    # the relay content-compresses, so a zeros batch skips the warmup and
    # the first real request would eat it; CLAUDE.md relay rules).
    import numpy as np

    rng = np.random.default_rng(0)
    for b in sorted(set(buckets), reverse=True):  # largest pays relay warmup
        warm = rng.integers(
            0, 256, (b, predictor.num_frames,
                     predictor.crop_size, predictor.crop_size, 3),
            dtype=np.uint8)
        predictor.predict_clip(warm)
        logger.info("Forward graph compiled for batch shape %s", warm.shape)

    server = InferenceServer(
        predictor, host=args.host, port=args.port,
        max_batch=args.max_batch, batch_timeout_ms=args.batch_timeout_ms,
        max_upload_mb=args.max_upload_mb, data_root=args.data_root,
        logger=logger,
        bucket_sizes=buckets if args.batch_buckets else None,
        decode_threads=args.decode_threads,
        queue_depth=args.queue_depth,
        request_timeout_ms=args.request_timeout_ms,
    )
    print(f"serving on http://{args.host}:{server.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
