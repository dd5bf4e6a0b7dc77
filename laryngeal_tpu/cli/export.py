"""Export CLI — checkpoint -> self-contained AOT inference artifact.

``python -m laryngeal_tpu.cli.export --model vivit --model_path ckpt/ \
    --out vivit.lxa --batch_sizes 1,8``

The artifact (see ``infer/export.py``) serves without any model code; load
it with ``ExportedModel.load`` (or ``cli.inference --exported``). The
reference has no deployment story beyond re-instantiating torch modules and
loading ``.pth`` files (``vivit_transformer/inference.py:31-88``).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Export a checkpoint as a self-contained StableHLO artifact")
    p.add_argument("--model", type=str, required=True,
                   choices=["vivit", "timesformer", "resnet3d",
                            "resnet50_lstm", "swin3d"])
    p.add_argument("--model_path", "--checkpoint_path", dest="model_path",
                   type=str, required=True)
    p.add_argument("--out", type=str, required=True,
                   help="Output artifact path (.lxa zip)")
    p.add_argument("--batch_sizes", type=str, default="1,8",
                   help="Comma-separated batch sizes to AOT-compile")
    p.add_argument("--quantize", type=str, default=None, choices=["int8"],
                   help="Bake W8A8 dynamically-quantized Dense layers "
                        "(~4x smaller artifact, 8e-4 measured prob drift; "
                        "speed-neutral here — fwd is attention-bound)")
    p.add_argument("--weights_mode", type=str, default="baked",
                   choices=["baked", "args"],
                   help="baked: weights as StableHLO constants in EVERY "
                        "graph (max self-contained); args: weights stored "
                        "once in the artifact, graphs take them as inputs "
                        "- multi-batch-size artifacts stop paying the "
                        "weight bytes per graph")
    p.add_argument("--weights_dtype", type=str, default=None,
                   choices=["bf16"],
                   help="Bake weights at reduced precision (half the "
                        "artifact; numerically free for bf16-compute models)")
    p.add_argument("--platforms", type=str, default=None,
                   help="Comma-separated jax platforms to lower for "
                        "(default: current backend; e.g. 'cpu,tpu')")
    p.add_argument("--num_frames", type=int, default=None)
    p.add_argument("--sampling_method", type=str, default="uniform",
                   choices=["uniform", "random", "random_window"])
    p.add_argument("--num_classes", type=int, default=2)
    p.add_argument("--model_size", type=str, default="tiny")
    p.add_argument("--hidden_size", type=int, default=256)
    p.add_argument("--num_layers", type=int, default=2)
    p.add_argument("--crop_size", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ..infer.export import export_checkpoint

    batch_sizes = [int(b) for b in args.batch_sizes.split(",") if b]
    platforms = (args.platforms.split(",") if args.platforms else None)
    path = export_checkpoint(
        args.model, args.model_path, args.out,
        batch_sizes=batch_sizes, platforms=platforms, quantize=args.quantize,
        weights_dtype=args.weights_dtype,
        weights_mode=args.weights_mode,
        num_frames=args.num_frames, sampling_method=args.sampling_method,
        num_classes=args.num_classes, crop_size=args.crop_size,
        image_size=args.image_size, model_size=args.model_size,
        hidden_size=args.hidden_size, num_layers=args.num_layers,
    )
    size_mb = path.stat().st_size / 1e6
    print(f"exported {args.model} -> {path} ({size_mb:.1f} MB, "
          f"batch sizes {batch_sizes})")
    return str(path)


if __name__ == "__main__":
    main()
