"""Inference CLI — single-video and batch modes.

Parity surface: ``vivit_transformer/inference.py`` (single video -> JSON
result with predicted class/confidence, ``save_inference_result`` schema at
:225-248) and ``resnet50-2d-lstm/inference.py:250-351`` (directory batch mode
with CSV summary). The forward path is ONE jitted graph: uint8 frames ->
preprocess -> backbone -> probabilities.
"""

from __future__ import annotations

import argparse
import csv
import json
from datetime import datetime
from pathlib import Path


def build_parser(model_default=None) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native laryngeal video inference")
    p.add_argument("--model", type=str, default=model_default,
                   choices=["vivit", "timesformer", "resnet3d", "resnet50_lstm", "swin3d"],
                   required=False)
    p.add_argument("--video_path", type=str, default=None)
    p.add_argument("--video_dir", type=str, default=None,
                   help="Batch mode over a directory tree of .mp4s")
    p.add_argument("--model_path", "--checkpoint_path", dest="model_path",
                   type=str, default=None, help="Checkpoint dir (orbax) from training")
    p.add_argument("--exported", type=str, default=None,
                   help="AOT artifact (cli.export output) — serves without "
                        "model code or checkpoint; overrides --model_path")
    p.add_argument("--log_dir", type=str, default="logs")
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--sampling_method", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--model_size", type=str, default="tiny")
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--crop_size", type=int, default=None,
                   help="Input resolution (default: checkpoint metadata, else 224)")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--save_viz", action="store_true")
    p.add_argument("--wire", type=str, default="rgb",
                   choices=("rgb", "i420", "delta", "dct", "dctp"),
                   help="host->device payload format for the clip transfer "
                        "(checkpoint-backed predictor only; dct/dctp are "
                        "lossy transform-coded wires — drift pinned in "
                        "BASELINE.md; the in-graph decode fuses into the "
                        "jitted forward)")
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
                        "LARYNGEAL_COMPILE_CACHE_DIR)")
    return p


def main(argv=None, model_default=None):
    args = build_parser(model_default).parse_args(argv)
    if not args.video_path and not args.video_dir:
        raise SystemExit("one of --video_path / --video_dir is required")
    if not args.exported and not args.model_path:
        raise SystemExit("one of --model_path / --exported is required")
    if not args.exported and not args.model:
        raise SystemExit("--model is required with --model_path")

    from ..utils.compile_cache import enable as enable_compile_cache
    from ..utils.logger import ExperimentLogger

    enable_compile_cache(args.compile_cache_dir)
    prefix = f"{args.model or 'exported'}-inference"
    exp_logger = ExperimentLogger(args.log_dir, prefix=prefix)
    logger = exp_logger.get_logger()
    exp_dir = exp_logger.get_experiment_dir()

    if args.exported:
        from ..infer.export import ExportedPredictor

        predictor = ExportedPredictor.load(args.exported, logger=logger)
        # The artifact bakes sampling/shape decisions at export time.
        overridden = [f for f, d in (("--sampling_method", "uniform"),
                                     ("--num_frames", None),
                                     ("--crop_size", None),
                                     ("--wire", "rgb"))
                      if getattr(args, f[2:]) not in (d, None)]
        if overridden:
            logger.warning(
                "%s ignored with --exported — the artifact pins "
                "sampling_method=%s num_frames=%d crop_size=%d",
                "/".join(overridden), predictor.sampling_method,
                predictor.num_frames, predictor.crop_size)
    else:
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

    results_dir = exp_dir / "inference_results"
    results_dir.mkdir(parents=True, exist_ok=True)

    if args.video_path:
        result = predictor.predict_video(args.video_path)
        out = results_dir / f"{Path(args.video_path).stem}_result.json"
        with open(out, "w") as f:
            json.dump(result, f, indent=4)
        logger.info("Result: %s (confidence %.4f) -> %s",
                    result["predicted_class"], result["confidence"], out)
        if args.save_viz:
            # Sampled-frames grid (reference inference.py save_frame_visualization).
            try:
                from ..utils.visualization import TrainingVisualizer

                # Frame grids need RGB regardless of the wire format: a
                # non-rgb wire's extract_clip returns I420 planes
                # (T, H*3/2, W), which imshow would render as a corrupt
                # colormapped grid (cli/main.py handles training viz the
                # same way).
                if predictor.wire == "rgb":
                    clip = predictor.extract_clip(args.video_path)
                else:
                    from ..data.video import decode_frames

                    hw = (predictor.crop_size, predictor.crop_size)
                    clip = decode_frames(
                        args.video_path, result["frame_indices"],
                        resize_to=hw)
                viz = TrainingVisualizer(results_dir)
                path = viz.visualize_sampling(
                    args.video_path, result["frame_indices"],
                    result["total_frames"], predictor.sampling_method,
                    frames=clip)
                logger.info("Frame visualization -> %s", path)
            except Exception as e:
                logger.warning("--save_viz failed: %s", e)
        print(json.dumps(result, indent=2))
        return result

    # Batch mode (2d-lstm inference.py:250-351): walk the tree, CSV + JSON.
    videos = sorted(Path(args.video_dir).rglob("*.mp4"))
    logger.info("Batch inference over %d videos", len(videos))
    results = predictor.predict_videos(
        [str(v) for v in videos], batch_size=args.batch_size)
    # Reproducibility audit of which frames each prediction sampled
    # (resnet50-3d-video/inference.py:206-245 save_sampled_frames).
    predictor.save_sampled_frames(results_dir)
    csv_path = results_dir / "batch_results.csv"
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["video_path", "predicted_class", "confidence", "prob_referral"])
        for r in results:
            w.writerow([r["video_path"], r["predicted_class"],
                        f"{r['confidence']:.6f}",
                        f"{r['probabilities'].get('referral', 0.0):.6f}"])
    summary = {
        "total": len(results),
        "predicted_referral": sum(r["predicted_class"] == "referral" for r in results),
        "timestamp": datetime.now().isoformat(),
    }
    with open(results_dir / "batch_summary.json", "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=4)
    logger.info("Batch results -> %s", csv_path)

    # Prediction-distribution plots (2d-lstm batch mode renders a class pie
    # and a confidence histogram, resnet50-2d-lstm/inference.py:309-351).
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(1, 2, figsize=(12, 5))
        counts = {}
        for r in results:
            counts[r["predicted_class"]] = counts.get(r["predicted_class"], 0) + 1
        axes[0].pie(list(counts.values()), labels=list(counts.keys()),
                    autopct="%1.1f%%", startangle=90)
        axes[0].set_title("Predicted class distribution")
        confs = [r["probabilities"].get("referral", 0.0) for r in results]
        axes[1].hist(confs, bins=20, range=(0, 1), color="steelblue", alpha=0.8)
        axes[1].set_xlabel("P(referral)")
        axes[1].set_ylabel("videos")
        axes[1].set_title("Referral-probability distribution")
        fig.tight_layout()
        fig.savefig(results_dir / "batch_distribution.png", dpi=100)
        plt.close(fig)
        logger.info("Distribution plots -> %s", results_dir / "batch_distribution.png")
    except Exception as e:
        logger.warning("Distribution plots failed: %s", e)
    print(json.dumps(summary, indent=2))
    return results


if __name__ == "__main__":
    main()
