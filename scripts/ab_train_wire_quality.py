"""Training-feed wire QUALITY A/B (round-3 VERDICT #5).

The bench wire swept to dctp q75 keep15 pack8 (+15.7% median e2e), but the
training feed conservatively kept keep31/pack14 with only inference-side
softmax-drift evidence. This script answers the training-side question
directly: does the extra quantization of k15p8 change LEARNING?

Method: the learnable synthetic signal (data/synthetic.py — the same
bright-disk set tests/test_learning.py pins the pipeline on) trained
through the REAL Trainer (host decode -> dct wire encode -> in-graph
decode -> preprocess -> ViViT), one run per arm from the same seed:
  rgb            — lossless control
  dctp k31/p14   — the near-lossless training default
  dctp k15/p8    — the bench operating point under test
Compared: per-epoch train/val loss+auroc, best epoch, final test metrics.

Run (CPU is fine — tiny ViViT):
    JAX_PLATFORM_NAME=cpu python scripts/ab_train_wire_quality.py \
        [--epochs 10] [--report]
"""

import argparse
import json
import sys

import numpy as np
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

ARMS = {
    "rgb": dict(wire="rgb"),
    "dctp_k31p14": dict(wire="dctp", wire_quality=75, wire_keep_ac=31,
                        wire_pack_from=14),
    "dctp_k15p8": dict(wire="dctp", wire_quality=75, wire_keep_ac=15,
                       wire_pack_from=8),
    # The round-4 lowres lever applied to TRAINING: decode at 1/2
    # resolution, wire carries the reduced geometry, preprocess resizes up.
    "dctp_k15p8_l1": dict(wire="dctp", wire_quality=75, wire_keep_ac=15,
                          wire_pack_from=8, wire_lowres=1),
}


def run_arm(data_dir, workdir, epochs, arm_kw, full_size=False):
    import jax

    from laryngeal_tpu.data.pipeline import create_dataloaders
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import (VivitConfig,
                                            VivitForVideoClassification)
    from laryngeal_tpu.train.trainer import Trainer

    if full_size:
        # --full_size: the real operating point (ViViT-B, 32f, 224^2, bf16,
        # B8) on the chip — closes the caveat that the learning A/B ran
        # only at 64^2 geometry.
        loaders = create_dataloaders(
            str(data_dir), num_frames=32, batch_size=8,
            resize_to=(224, 224), pad_last=True, seed=0, **arm_kw)
        import jax.numpy as jnp

        cfg = VivitConfig(num_frames=32, dtype=jnp.bfloat16)
        config = {"epochs": epochs, "learning_rate": 1e-3, "crop_size": 224,
                  "seed": 0, "use_early_stopping": False}
    else:
        loaders = create_dataloaders(
            str(data_dir), num_frames=8, batch_size=4, resize_to=(64, 64),
            pad_last=True, seed=0, **arm_kw)
        cfg = VivitConfig(hidden_size=48, num_layers=3, num_heads=2,
                          intermediate_size=96, image_size=64, num_frames=8)
        config = {"epochs": epochs, "learning_rate": 1e-3, "crop_size": 64,
                  "seed": 0, "use_early_stopping": False}
    model = VivitForVideoClassification(cfg)
    spec = get_model_spec("vivit")
    trainer = Trainer(model, spec, loaders, config, exp_dir=workdir)
    trainer.train()

    from laryngeal_tpu.evals.evaluator import Evaluator

    evaluator = Evaluator(trainer.eval_step, loaders["test"],
                          exp_dir=workdir)
    auroc, f1, cm = evaluator.evaluate(trainer.state)
    best = min(range(len(trainer.history["val_loss"])),
               key=lambda i: trainer.history["val_loss"][i])
    return {
        "train_loss": [round(v, 5) for v in trainer.history["train_loss"]],
        "val_loss": [round(v, 5) for v in trainer.history["val_loss"]],
        "train_auroc": [round(v, 4) for v in trainer.history["train_auroc"]],
        "val_auroc": [round(v, 4) for v in trainer.history["val_auroc"]],
        "best_epoch_min_val_loss": best,
        "test": {"auroc": round(float(auroc), 4), "f1": round(float(f1), 4),
                 "cm": np.asarray(cm).tolist() if cm is not None else None},
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--workdir", default=None,
                    help="default: /tmp/ab_train_wire (tiny) or "
                         "/tmp/ab_train_wire_full (--full_size) — the two "
                         "modes generate different-geometry datasets and "
                         "must not share a data dir")
    ap.add_argument("--full_size", action="store_true",
                    help="ViViT-B 32f 224^2 bf16 B8 ON THE CHIP (2 dctp "
                         "arms only; ~10 min/arm of remote compile on a "
                         "cold cache) instead of the tiny-CPU model")
    ap.add_argument("--arms", type=str, default=None,
                    help="comma-separated subset of the arm names")
    args = ap.parse_args()

    import jax

    if not args.full_size:
        jax.config.update("jax_platforms", "cpu")
    else:
        from laryngeal_tpu.utils.compile_cache import enable as _cc

        _cc("/tmp/laryngeal_cc")  # env LARYNGEAL_COMPILE_CACHE_DIR overrides

    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    work = Path(args.workdir or ("/tmp/ab_train_wire_full" if args.full_size
                                 else "/tmp/ab_train_wire"))
    data = work / "data"
    # Round-3 full-size recipe: 32 videos, learnable lesion signal.
    recipe = (dict(splits={"train": 8, "val": 4, "test": 4}, num_frames=96,
                   h=224, w=224, seed=11, varied_lengths=True)
              if args.full_size else
              dict(splits={"train": 12, "val": 4, "test": 8}, num_frames=12,
                   h=64, w=64, seed=21, varied_lengths=False))
    marker = data / ".recipe.json"
    if data.exists():
        # A pre-existing data dir with a different recipe would silently
        # corrupt the measurement (e.g. a tiny-mode 64px set reused by a
        # --full_size run, upscaled to 224 by the pipeline without error).
        if not marker.exists() or json.loads(marker.read_text()) != recipe:
            raise SystemExit(
                f"{data} exists but was generated with a different recipe "
                f"(or predates recipe markers); remove it or pass a fresh "
                f"--workdir")
    else:
        kw = dict(recipe)
        make_synthetic_dataset(str(data), kw.pop("splits"), **kw)
        marker.write_text(json.dumps(recipe))

    arms = dict(ARMS)
    if args.full_size and args.arms is None:
        arms = {k: ARMS[k] for k in ("dctp_k31p14", "dctp_k15p8")}
    elif args.arms:
        arms = {k: ARMS[k] for k in args.arms.split(",")}

    out = {}
    for name, kw in arms.items():
        print(f"=== arm {name} ===", flush=True)
        out[name] = run_arm(data, work / name, args.epochs, kw,
                            full_size=args.full_size)
        print(json.dumps(out[name]), flush=True)

    # Verdict lines: does each lossy arm track the near-lossless wire?
    if "dctp_k31p14" not in out:
        return
    a = out["dctp_k31p14"]
    for name in ("dctp_k15p8", "dctp_k15p8_l1"):
        if name not in out:
            continue
        b = out[name]
        print(json.dumps({
            "arm": name,
            "same_best_epoch": (a["best_epoch_min_val_loss"]
                                == b["best_epoch_min_val_loss"]),
            "final_val_loss_delta_vs_k31": round(
                abs(a["val_loss"][-1] - b["val_loss"][-1]), 5),
            "test_auroc_delta_vs_k31": round(
                abs(a["test"].get("auroc", 0) - b["test"].get("auroc", 0)),
                5),
            "max_epoch_val_loss_delta": round(max(
                abs(x - y) for x, y in zip(a["val_loss"], b["val_loss"])), 5),
        }))


if __name__ == "__main__":
    main()
