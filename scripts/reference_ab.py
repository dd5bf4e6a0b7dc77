"""Run the ACTUAL reference pipelines A/B against this framework.

Whole-loop parity proof (round-2 VERDICT "next round" #1): the reference's
own ``vivit_transformer/main.py`` / ``timesformer/main.py`` run unmodified
(subprocess, torch CPU, pytorchvideo stubbed via
``laryngeal_tpu/compat/stubs``) on a seeded synthetic dataset from a tiny HF
checkpoint saved with ``save_pretrained``; our ``laryngeal_tpu.cli.main``
runs on the SAME dataset from the SAME weights (``--torch_weights``).
Compared: per-epoch train/val loss + accuracy histories, the selected best
epoch (min val loss, vivit_transformer/.../trainers/trainer.py:249-262), and
the final ``test_metrics_uniform.json`` (accuracy / F1 / AUROC / confusion
matrix, vivit_transformer/.../evaluators/evaluator.py:122-255).

Known tolerance floor: the ViViT regime resizes 224->256->crop-224
(VivitImageProcessor semantics); PIL-vs-jax bilinear resampling differs at
the ~1e-2 pixel level (tests/test_transforms.py), which propagates to a
small per-epoch loss delta. Everything else (samplers, preprocess affine,
model math, AdamW) is pinned exactly by the per-component parity suites.

Usage:
    python scripts/reference_ab.py --variant vivit --workdir /tmp/ab \
        [--epochs 3] [--report AB_REPORT.md]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REFERENCE = Path(os.environ.get("LARYNGEAL_REFERENCE_DIR", "/root/reference"))
STUBS = REPO / "laryngeal_tpu" / "compat" / "stubs"

TINY = dict(hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
NUM_FRAMES = 4
BATCH = 8
IMAGE = 224

VARIANTS = {
    "vivit": {"ref_dir": "vivit_transformer", "prefix": "vivit-classifier"},
    "timesformer": {"ref_dir": "timesformer", "prefix": "timesformer-classifier"},
}


def make_dataset(root: Path) -> Path:
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    # 224^2 native so both decode paths see identical uint8 frames (any
    # resize is the identity); T >= 5 everywhere, sampled with the
    # deterministic uniform method on both sides.
    return make_synthetic_dataset(
        str(root), {"train": 4, "val": 2, "test": 4}, num_frames=10,
        h=IMAGE, w=IMAGE, seed=11, varied_lengths=True)


def make_tiny_checkpoint(out_dir: Path, variant: str, seed: int = 0) -> Path:
    """Tiny HF checkpoint via save_pretrained — the reference loads it by
    passing the directory as --model_name (from_pretrained accepts local
    paths, so no network and no reference-code changes)."""
    import torch

    out_dir.mkdir(parents=True, exist_ok=True)
    if variant == "vivit":
        from transformers import VivitConfig as HFConfig
        from transformers import VivitForVideoClassification as HFModel

        cfg = HFConfig(
            num_frames=NUM_FRAMES, image_size=IMAGE, tubelet_size=[2, 16, 16],
            num_labels=2, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, **TINY,
            num_hidden_layers=TINY["num_layers"],
            num_attention_heads=TINY["num_heads"])
    else:
        from transformers import TimesformerConfig as HFConfig
        from transformers import TimesformerForVideoClassification as HFModel

        cfg = HFConfig(
            num_frames=NUM_FRAMES, image_size=IMAGE, patch_size=16,
            num_labels=2, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, drop_path_rate=0.0, **TINY,
            num_hidden_layers=TINY["num_layers"],
            num_attention_heads=TINY["num_heads"])
    # HFConfig ignores unknown kwargs; set the canonical names explicitly.
    cfg.hidden_size = TINY["hidden_size"]
    cfg.intermediate_size = TINY["intermediate_size"]

    torch.manual_seed(seed)
    model = HFModel(cfg).eval()
    with torch.no_grad():  # zero-init embeddings carry no signal — randomize
        for name, p in model.named_parameters():
            if "embeddings" in name and p.abs().sum() == 0:
                p.normal_(0, 0.02)
    model.save_pretrained(out_dir)
    torch.save(model.state_dict(), out_dir / "sd.pth")
    return out_dir


def seed_hf_processor_cache(hf_home: Path, repo_id: str, config_json: str):
    """Materialize a preprocessor_config.json in HF-hub cache layout so the
    reference's hardcoded ``AutoImageProcessor.from_pretrained(<hub id>)``
    (timesformer/.../trainers/trainer.py:22) resolves offline."""
    base = hf_home / "hub" / f"models--{repo_id.replace('/', '--')}"
    sha = "0" * 40
    (base / "refs").mkdir(parents=True, exist_ok=True)
    (base / "refs" / "main").write_text(sha)
    snap = base / "snapshots" / sha
    snap.mkdir(parents=True, exist_ok=True)
    (snap / "preprocessor_config.json").write_text(config_json)


def _newest(pattern_dir: Path, glob: str) -> Path:
    cands = sorted(pattern_dir.glob(glob), key=lambda p: p.stat().st_mtime)
    if not cands:
        raise FileNotFoundError(f"no {glob} under {pattern_dir}")
    return cands[-1]


def run_reference(variant: str, data_dir: Path, ckpt_dir: Path, workdir: Path,
                  epochs: int, timeout_s: int = 1800) -> dict:
    v = VARIANTS[variant]
    logs = workdir / f"ref_{variant}_logs"
    models = workdir / f"ref_{variant}_models"
    hf_home = workdir / "hf_home"

    if variant == "timesformer":
        # Our timesformer regime is pinned to VideoMAEImageProcessor()
        # defaults (tests/test_transforms.py); seed the same config so both
        # sides normalize identically. (The true hub config for the k400
        # checkpoint may use mean .45/std .225 — unverifiable offline; the
        # A/B validates the LOOP, the normalization constants are pinned
        # separately per regime.)
        from transformers import VideoMAEImageProcessor

        seed_hf_processor_cache(
            hf_home, "facebook/timesformer-base-finetuned-k400",
            VideoMAEImageProcessor().to_json_string())

    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / v["ref_dir"]), str(STUBS)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", HF_HUB_OFFLINE="1",
               CUDA_VISIBLE_DEVICES="", HF_HOME=str(hf_home),
               TOKENIZERS_PARALLELISM="false")

    cmd = [sys.executable, str(REFERENCE / v["ref_dir"] / "main.py"),
           "--data_dir", str(data_dir),
           "--log_dir", str(logs), "--model_dir", str(models),
           "--model_name", str(ckpt_dir),
           "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
           "--epochs", str(epochs), "--num_workers", "0",
           "--patience", "99", "--learning_rate", "0.001",
           "--weight_decay", "0.01", "--seed", "42"]
    proc = subprocess.run(cmd, cwd=str(workdir), env=env, timeout=timeout_s,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference {variant} failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")

    import torch

    exp_dir = _newest(logs, f"{v['prefix']}-*")
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    # The reference persists history ONLY inside the best-model checkpoint
    # (saved on improvement, trainer.py:291-305) — so the recoverable
    # history runs through the best epoch; the comparison below covers that
    # prefix.
    ckpt = torch.load(_newest(models, "*.pth"), map_location="cpu",
                      weights_only=False)
    return {"history": ckpt["history"], "best_epoch": int(ckpt["epoch"]),
            "metrics": metrics, "exp_dir": str(exp_dir)}


def run_ours(variant: str, data_dir: Path, sd_path: Path, workdir: Path,
             epochs: int, timeout_s: int = 1800) -> dict:
    logs = workdir / f"ours_{variant}_logs"
    argv = ["--model", variant, "--data_dir", str(data_dir),
            "--log_dir", str(logs),
            "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
            "--epochs", str(epochs), "--patience", "99",
            "--torch_weights", str(sd_path),
            "--hidden_size", str(TINY["hidden_size"]),
            "--num_layers", str(TINY["num_layers"]),
            "--num_heads", str(TINY["num_heads"]),
            "--intermediate_size", str(TINY["intermediate_size"]),
            "--learning_rate", "0.001", "--weight_decay", "0.01",
            "--seed", "42"]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from laryngeal_tpu.cli.main import main; "
            f"main({argv!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", LARYNGEAL_PRETRAINED="0",
               JAX_PLATFORMS="cpu")
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(workdir),
                          env=env, timeout=timeout_s, capture_output=True,
                          text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"ours {variant} failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")

    exp_dir = _newest(logs, f"{variant}-classifier-*")
    history = json.loads((exp_dir / "training_history.json").read_text())
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    val = history["val_loss"]
    return {"history": history, "best_epoch": int(val.index(min(val))),
            "metrics": metrics, "exp_dir": str(exp_dir)}


def compare(ref: dict, ours: dict) -> dict:
    """Structured deltas + pass/fail flags."""
    import numpy as np

    out = {"epochs": len(ref["history"]["train_loss"])}
    for k in ("train_loss", "val_loss", "train_acc", "val_acc"):
        r = np.asarray(ref["history"][k], dtype=float)
        o = np.asarray(ours["history"].get(k, []), dtype=float)[:len(r)]
        out[f"{k}_ref"] = [round(x, 6) for x in r.tolist()]
        out[f"{k}_ours"] = [round(x, 6) for x in o.tolist()]
        out[f"{k}_max_abs_delta"] = (round(float(np.abs(r - o).max()), 6)
                                     if len(o) == len(r) else None)
    out["best_epoch_ref"] = ref["best_epoch"]
    out["best_epoch_ours"] = ours["best_epoch"]
    out["best_epoch_match"] = ref["best_epoch"] == ours["best_epoch"]

    rm, om = ref["metrics"], ours["metrics"]
    for k in ("accuracy", "f1_score", "precision", "recall", "auroc"):
        out[f"test_{k}_ref"] = round(float(rm.get(k, float("nan"))), 6)
        out[f"test_{k}_ours"] = round(float(om.get(k, float("nan"))), 6)
    cm_r = np.asarray(rm.get("confusion_matrix", []))
    cm_o = np.asarray(om.get("confusion_matrix", []))
    out["confusion_matrix_ref"] = cm_r.tolist()
    out["confusion_matrix_ours"] = cm_o.tolist()
    out["pred_flips"] = (int(np.abs(cm_r - cm_o).sum()) // 2
                         if cm_r.shape == cm_o.shape and cm_r.size else None)
    return out


def write_report(results: dict, path: Path, epochs: int):
    lines = [
        "# AB_REPORT — reference pipelines vs laryngeal_tpu (whole loop)",
        "",
        "Generated by `scripts/reference_ab.py`. The unmodified reference "
        "`main.py` (torch CPU, pytorchvideo stubbed -> its own cv2 fallback) "
        "and `laryngeal_tpu.cli.main` (jax CPU) trained from IDENTICAL tiny "
        "HF weights on the SAME seeded synthetic dataset "
        f"({epochs} epochs, {NUM_FRAMES} frames, batch {BATCH}, uniform "
        "sampling, AdamW 1e-3/wd 0.01, seed 42).",
        "",
        "Known tolerance floor: PIL-vs-jax bilinear resampling in the ViViT "
        "256->224 processor regime (~1e-2 pixel-level, "
        "tests/test_transforms.py); every other stage is pinned exactly by "
        "the per-component parity suites.",
        "",
        "Epoch tables cover the history the reference itself persists — it "
        "saves history only inside the best-model checkpoint "
        "(trainer.py:291-305), i.e. through the selected best epoch.",
        "",
    ]
    for variant, cmp_ in results.items():
        lines += [f"## {variant}", ""]
        lines += ["| epoch | ref train loss | ours train loss | ref val loss "
                  "| ours val loss |", "|---|---|---|---|---|"]
        for i in range(cmp_["epochs"]):
            lines.append(
                f"| {i} | {cmp_['train_loss_ref'][i]:.4f} | "
                f"{cmp_['train_loss_ours'][i]:.4f} | "
                f"{cmp_['val_loss_ref'][i]:.4f} | "
                f"{cmp_['val_loss_ours'][i]:.4f} |")
        lines += [
            "",
            f"- max |Δ| train loss: {cmp_['train_loss_max_abs_delta']}, "
            f"val loss: {cmp_['val_loss_max_abs_delta']}",
            f"- best epoch (min val loss): ref {cmp_['best_epoch_ref']} vs "
            f"ours {cmp_['best_epoch_ours']} "
            f"({'MATCH' if cmp_['best_epoch_match'] else 'DIFFER'})",
            f"- test accuracy: ref {cmp_['test_accuracy_ref']} vs ours "
            f"{cmp_['test_accuracy_ours']}; AUROC: ref "
            f"{cmp_['test_auroc_ref']} vs ours {cmp_['test_auroc_ours']}; "
            f"F1: ref {cmp_['test_f1_score_ref']} vs ours "
            f"{cmp_['test_f1_score_ours']}",
            f"- confusion matrix ref {cmp_['confusion_matrix_ref']} vs ours "
            f"{cmp_['confusion_matrix_ours']} "
            f"(prediction flips: {cmp_['pred_flips']})",
            "",
        ]
    path.write_text("\n".join(lines))


def run_ab(variant: str, workdir: Path, epochs: int = 3) -> dict:
    workdir.mkdir(parents=True, exist_ok=True)
    data = make_dataset(workdir / "data")
    ckpt = make_tiny_checkpoint(workdir / f"tiny_{variant}", variant)
    ref = run_reference(variant, data, ckpt, workdir, epochs)
    ours = run_ours(variant, data, ckpt / "sd.pth", workdir, epochs)
    return compare(ref, ours)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", default="both",
                    choices=["vivit", "timesformer", "both"])
    ap.add_argument("--workdir", default="/tmp/laryngeal_ab")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--report", default=str(REPO / "AB_REPORT.md"))
    args = ap.parse_args()

    variants = (["vivit", "timesformer"] if args.variant == "both"
                else [args.variant])
    results = {}
    for v in variants:
        print(f"=== A/B {v} ===", flush=True)
        results[v] = run_ab(v, Path(args.workdir) / v, args.epochs)
        print(json.dumps(results[v], indent=2), flush=True)
    write_report(results, Path(args.report), args.epochs)
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
