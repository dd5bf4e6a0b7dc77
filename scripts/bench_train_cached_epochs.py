"""Cached-epoch training throughput on the chip (round-4 VERDICT #3).

The reference's defining host-side waste is re-decoding every video every
epoch (vivit_transformer/.../trainers/trainer.py:62-104, SURVEY §3.1 "HOT
LOOP"). VideoDataset caches *encoded wire payloads* keyed by (path, frame
indices), so under a deterministic sampler (uniform) epochs 2+ skip decode
AND wire-encode entirely and the feed approaches the compute-bound step
rate. This script measures that through the REAL Trainer:

  full-size ViViT-B 32f 224^2 bf16 B8, synthetic 224^2 dataset, uniform
  sampling, --wire dctp (training-feed defaults), N epochs; reports
  per-epoch train clips/s from the trainer's own accounting plus the
  ClipCache hit/miss counters per epoch.

Usage (on the TPU):
  LARYNGEAL_COMPILE_CACHE_DIR=/tmp/laryngeal_cc \
      python scripts/bench_train_cached_epochs.py [--epochs 3]
      [--train_videos 32] [--tiny]  # --tiny: CPU smoke (64^2 tiny model)
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--train_videos", type=int, default=16,
                    help="videos per class in train (total = 2x this)")
    ap.add_argument("--num_frames", type=int, default=32)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke: 64^2 tiny model instead of ViViT-B")
    ap.add_argument("--no_cache", action="store_true",
                    help="control arm: cache off (every epoch re-decodes)")
    ap.add_argument("--data_dir", default=None,
                    help="reuse an existing synthetic dataset dir")
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from laryngeal_tpu.data.pipeline import create_dataloaders
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import (VivitConfig,
                                            VivitForVideoClassification)
    from laryngeal_tpu.train.trainer import Trainer
    from laryngeal_tpu.utils import compile_cache

    compile_cache.enable()
    side = 64 if args.tiny else 224
    t_gen0 = time.time()
    if args.data_dir:
        data_dir = args.data_dir
    else:
        tmp = tempfile.mkdtemp(prefix="cached_epochs_")
        make_synthetic_dataset(
            tmp, {"train": args.train_videos, "val": 2, "test": 2},
            num_frames=args.num_frames + 16, h=side, w=side, seed=3)
        data_dir = tmp
    print(f"dataset at {data_dir} ({time.time() - t_gen0:.0f}s)", flush=True)

    loaders = create_dataloaders(
        data_dir,
        sampling_methods={"train": "uniform", "val": "uniform",
                          "test": "uniform"},
        num_frames=args.num_frames if not args.tiny else 4,
        batch_size=args.batch_size,
        resize_to=(side, side),
        pad_last=True,
        cache_clips=not args.no_cache,
        clip_cache_mb=4096,
        wire="dctp",
    )
    if args.tiny:
        model = VivitForVideoClassification(VivitConfig(
            hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64,
            image_size=side, num_frames=4, num_classes=2))
    else:
        import jax.numpy as jnp

        model = VivitForVideoClassification(VivitConfig(
            num_frames=args.num_frames, image_size=side, num_classes=2,
            dtype=jnp.bfloat16))
    spec = get_model_spec("vivit")
    config = {"epochs": args.epochs, "crop_size": side, "seed": 42,
              "batch_size": args.batch_size, "save_every": 0,
              "use_early_stopping": False}
    exp = Path(tempfile.mkdtemp(prefix="cached_epochs_exp_"))
    trainer = Trainer(model, spec, loaders, config, exp_dir=exp)

    cache = loaders["train"].dataset._clip_cache
    rows = []
    # Drive epoch-by-epoch so cache counters can be sliced per epoch.
    for epoch in range(args.epochs):
        before = cache.stats()
        t0 = time.time()
        tr = trainer._run_epoch("train", train=True, epoch=epoch)
        wall = time.time() - t0
        after = cache.stats()
        row = {
            "epoch": epoch + 1,
            "train_clips_per_sec": round(tr["clips_per_sec"], 2),
            "wall_s": round(wall, 2),
            "cache_hits": after["hits"] - before["hits"],
            "cache_misses": after["misses"] - before["misses"],
            "cache_entries": after["entries"],
            "cache_mb": round(after["bytes"] / 1e6, 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    e1 = rows[0]["train_clips_per_sec"]
    rest = [r["train_clips_per_sec"] for r in rows[1:]]
    print(json.dumps({
        "epoch1_clips_per_sec": e1,
        "epoch2plus_median": sorted(rest)[len(rest) // 2] if rest else None,
        "speedup": round(sorted(rest)[len(rest) // 2] / e1, 2) if rest else None,
        "cache": "off" if args.no_cache else "on",
    }), flush=True)


if __name__ == "__main__":
    main()
