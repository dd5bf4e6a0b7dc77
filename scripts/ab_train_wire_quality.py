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


def run_arm(data_dir, workdir, epochs, arm_kw):
    import jax

    from laryngeal_tpu.data.pipeline import create_dataloaders
    from laryngeal_tpu.models.registry import get_model_spec
    from laryngeal_tpu.models.vivit import (VivitConfig,
                                            VivitForVideoClassification)
    from laryngeal_tpu.train.trainer import Trainer

    loaders = create_dataloaders(
        str(data_dir), num_frames=8, batch_size=4, resize_to=(64, 64),
        pad_last=True, seed=0, **arm_kw)
    cfg = VivitConfig(hidden_size=48, num_layers=3, num_heads=2,
                      intermediate_size=96, image_size=64, num_frames=8)
    model = VivitForVideoClassification(cfg)
    spec = get_model_spec("vivit")
    config = {"epochs": epochs, "learning_rate": 1e-3, "crop_size": 64,
              "seed": 0, "use_early_stopping": False}
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
    ap.add_argument("--workdir", default="/tmp/ab_train_wire")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    work = Path(args.workdir)
    data = work / "data"
    if not data.exists():
        make_synthetic_dataset(str(data), {"train": 12, "val": 4, "test": 8},
                               num_frames=12, h=64, w=64, seed=21,
                               varied_lengths=False)

    out = {}
    for name, kw in ARMS.items():
        print(f"=== arm {name} ===", flush=True)
        out[name] = run_arm(data, work / name, args.epochs, kw)
        print(json.dumps(out[name]), flush=True)

    # Verdict lines: does each lossy arm track the near-lossless wire?
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
