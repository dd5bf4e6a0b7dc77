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
    # LARYNGEAL_PIL_EXACT: route the HF regimes through the bit-exact
    # Pillow resample (preprocess/pil_resize.py) — the reference side
    # resizes via PIL inside the image processor, so the A/B's last
    # tolerance floor (PIL-vs-jax bilinear, ~1e-2 pixel) vanishes.
    env.update(MPLBACKEND="Agg", LARYNGEAL_PRETRAINED="0",
               JAX_PLATFORMS="cpu", LARYNGEAL_PIL_EXACT="1")
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
        "resnet3d methodology (the CNN family has no cv2 fallback and "
        "hard-uses pytorchvideo, absent here): the stub package implements "
        "the real contracts — cv2-backed EncodedVideo, torch transforms, "
        "and a plain-torch slow-R50 `create_resnet` whose state dict ports "
        "at 5e-8 logit parity (tests/test_resnet3d_parity.py pins the same "
        "network). Disclosed A/B controls: (1) clips have exactly "
        "num_frames frames at the assumed 30 fps so the reference's "
        "index->seconds->subsample round trip (dataset.py:221-231) is the "
        "identity; (2) torch-vs-jax augmentation/dropout RNG streams cannot "
        "be aligned, so LARYNGEAL_STUB_DETERMINISTIC=1 pins the reference's "
        "random transforms to the deterministic eval pipeline and our side "
        "trains with LARYNGEAL_NO_AUGMENT=1 / --dropout 0; (3) the stub "
        "Normalize folds in the /255 the reference's own inference paths "
        "apply (inference.py:167,383) but its train transform omits.",
        "",
    ]
    for variant, cmp_ in results.items():
        lines += [f"## {variant}", ""]
        if cmp_.get("train_loop"):
            series = [k[:-4] for k in cmp_ if k.endswith("_ref")
                      and isinstance(cmp_[k], list)
                      and k not in ("save_epochs_ref",
                                    "confusion_matrix_ref")]
            loop_series = [s for s in ("train_loss", "val_loss",
                                       "val_auroc", "learning_rate")
                           if s in series]
            lines += ["| epoch | " + " | ".join(
                f"ref {s} | ours {s}" for s in loop_series) + " |",
                "|---|" + "---|" * (2 * len(loop_series))]
            # Row count bounded by the SHORTEST series on either side:
            # compare() tolerates length-mismatched histories (delta=None),
            # so the report must too — an IndexError here would lose the
            # multi-hour run's report (the JSON sidecar notwithstanding).
            n_rows = min([cmp_["epochs"]]
                         + [len(cmp_[f"{s}_{side}"]) for s in loop_series
                            for side in ("ref", "ours")])
            for i in range(n_rows):
                cells = []
                for s in loop_series:
                    cells += [f"{cmp_[f'{s}_ref'][i]:.4f}",
                              f"{cmp_[f'{s}_ours'][i]:.4f}"]
                lines.append(f"| {i} | " + " | ".join(cells) + " |")
            if n_rows < cmp_["epochs"]:
                lines.append(f"| ... | (series lengths differ: table "
                             f"truncated at {n_rows} of "
                             f"{cmp_['epochs']} epochs) |")
            lines.append("")
            for s in series:
                d = cmp_.get(f"{s}_max_abs_delta")
                if d is not None:
                    lines.append(f"- max |Δ| {s}: {d}")
            if "save_epochs_ref" in cmp_:
                lines.append(
                    f"- selection (save) events: ref "
                    f"{cmp_['save_epochs_ref']} vs ours "
                    f"{cmp_['save_epochs_ours']} "
                    f"({'MATCH' if cmp_['save_epochs_match'] else 'DIFFER'})")
            if "epochs_ran_ref" in cmp_:
                lines.append(
                    f"- epochs ran (early-stop quirk): ref "
                    f"{cmp_['epochs_ran_ref']} vs ours "
                    f"{cmp_['epochs_ran_ours']}; best-model saves: ref "
                    f"{cmp_['n_saves_ref']} vs ours {cmp_['n_saves_ours']}")
            lines += [
                f"- best epoch: ref {cmp_['best_epoch_ref']} vs ours "
                f"{cmp_['best_epoch_ours']} "
                f"({'MATCH' if cmp_['best_epoch_match'] else 'DIFFER'})",
                f"- test AUROC: ref {cmp_['test_auroc_ref']} vs ours "
                f"{cmp_['test_auroc_ours']}; F1: ref "
                f"{cmp_['test_f1_score_ref']} vs ours "
                f"{cmp_['test_f1_score_ours']}",
                f"- confusion matrix ref {cmp_['confusion_matrix_ref']} vs "
                f"ours {cmp_['confusion_matrix_ours']}",
            ]
            if cmp_.get("notes"):
                lines.append(f"- {cmp_['notes']}")
            lines.append("")
            continue
        if cmp_.get("inference_only"):
            lines += [
                "Inference A/B (the swin family's train CLI has no "
                "eval-only mode; its `inference.py` is run UNMODIFIED per "
                "test video vs our `cli.inference`, identical injected "
                "weights, uniform sampling — deterministic). Training "
                "dynamics are pinned step-level in "
                "tests/test_swin3d_train_parity.py.",
                "",
                "| video | ref class | ours class | ref conf | ours conf |",
                "|---|---|---|---|---|",
            ]
            for r in cmp_["videos"]:
                lines.append(
                    f"| {r['video']} | {r['ref_class']} | {r['ours_class']} "
                    f"| {r['ref_confidence']:.4f} | "
                    f"{r['ours_confidence']:.4f} |")
            lines += [
                "",
                f"- all predicted classes match: "
                f"{cmp_['all_classes_match']}; max |Δ| confidence: "
                f"{cmp_['max_confidence_delta']}",
                "",
            ]
            continue
        if cmp_.get("eval_only"):
            lines += [
                "Eval-mode A/B (the reference's own --checkpoint_path "
                "loop: decode -> eval transforms -> model -> sklearn "
                "metrics), identical injected weights. Deterministic — no "
                "RNG caveats. Training dynamics for this family are pinned "
                "step-level in tests/test_lstm_train_parity.py.",
                "",
                f"- test accuracy: ref {cmp_['test_accuracy_ref']} vs ours "
                f"{cmp_['test_accuracy_ours']}; AUROC: ref "
                f"{cmp_['test_auroc_ref']} vs ours {cmp_['test_auroc_ours']}; "
                f"F1: ref {cmp_['test_f1_score_ref']} vs ours "
                f"{cmp_['test_f1_score_ours']}",
                f"- confusion matrix ref {cmp_['confusion_matrix_ref']} vs "
                f"ours {cmp_['confusion_matrix_ours']} "
                f"(prediction flips: {cmp_['pred_flips']})",
            ]
            if cmp_.get("notes"):
                lines.append(f"- {cmp_['notes']}")
            lines.append("")
            continue
        lines += ["| epoch | ref train loss | ours train loss | ref val loss "
                  "| ours val loss |", "|---|---|---|---|---|"]
        n_rows = min(cmp_["epochs"],
                     len(cmp_["train_loss_ours"]), len(cmp_["val_loss_ours"]))
        for i in range(n_rows):
            lines.append(
                f"| {i} | {cmp_['train_loss_ref'][i]:.4f} | "
                f"{cmp_['train_loss_ours'][i]:.4f} | "
                f"{cmp_['val_loss_ref'][i]:.4f} | "
                f"{cmp_['val_loss_ours'][i]:.4f} |")
        if n_rows < cmp_["epochs"]:
            lines.append(f"| ... | (series lengths differ: table truncated "
                         f"at {n_rows} of {cmp_['epochs']} epochs) |")
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


def make_resnet3d_dataset(root: Path) -> Path:
    """Clips with EXACTLY num_frames frames at the dataset's assumed 30 fps:
    uniform sampling then selects every frame, so the reference's
    index->seconds->get_clip->UniformTemporalSubsample round trip
    (``resnet50-3d-video/.../dataset.py:221-231``, a resampling quirk our
    exact-index pipeline deliberately does not replicate) collapses to the
    identity and both sides consume identical frames. The samplers
    themselves are pinned separately (tests/test_samplers.py)."""
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        str(root), {"train": 4, "val": 2, "test": 4}, num_frames=NUM_FRAMES,
        h=IMAGE, w=IMAGE, fps=30.0, seed=13, varied_lengths=False)


def make_resnet3d_weights(out_dir: Path, seed: int = 0) -> Path:
    """Seeded slow-R50 state dict via the stub's create_resnet (pytorchvideo
    naming) — injected into the unmodified reference through
    LARYNGEAL_STUB_RESNET_INIT and into our CLI through --torch_weights."""
    import torch

    out_dir.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, str(STUBS))
    try:
        from pytorchvideo.models.resnet import create_resnet

        torch.manual_seed(seed)
        model = create_resnet(model_depth=50, model_num_class=2,
                              dropout_rate=0.0, input_channel=3)
        sd_path = out_dir / "sd.pth"
        torch.save(model.state_dict(), sd_path)
        return sd_path
    finally:
        sys.path.remove(str(STUBS))
        for mod in [m for m in sys.modules if m.startswith("pytorchvideo")]:
            del sys.modules[mod]


def run_reference_resnet3d(data_dir: Path, sd_path: Path, workdir: Path,
                           epochs: int, timeout_s: int = 3600) -> dict:
    """The unmodified ``resnet50-3d-video/main.py``: full slow-R50, Adam,
    loss+acc-threshold model selection, clip-averaged eval. Its dataset has
    NO cv2 fallback, so the stub EncodedVideo decodes for real
    (LARYNGEAL_STUB_DECODE=1), and LARYNGEAL_STUB_DETERMINISTIC=1 pins the
    un-alignable torch augmentation/dropout RNG (disclosed in the report)."""
    logs = workdir / "ref_resnet3d_logs"
    models = workdir / "ref_resnet3d_models"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "resnet50-3d-video"), str(STUBS)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
               LARYNGEAL_STUB_DECODE="1", LARYNGEAL_STUB_DETERMINISTIC="1",
               LARYNGEAL_STUB_RESNET_INIT=str(sd_path))

    cmd = [sys.executable, str(REFERENCE / "resnet50-3d-video" / "main.py"),
           "--data_dir", str(data_dir),
           "--log_dir", str(logs), "--model_dir", str(models),
           "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
           "--epochs", str(epochs), "--num_workers", "0",
           "--patience", "99", "--learning_rate", "0.001", "--seed", "42"]
    proc = subprocess.run(cmd, cwd=str(workdir), env=env, timeout=timeout_s,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference resnet3d failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")

    import torch

    exp_dir = _newest(logs, "resnet50-3d-training-*")
    metrics = json.loads((exp_dir / "test_metrics.json").read_text())
    ckpt = torch.load(_newest(models, "*_resnet50_best_model.pth"),
                      map_location="cpu", weights_only=False)
    # _save_best_model runs inside the val phase BEFORE that epoch's history
    # append (trainer.py:162-176), so the persisted history covers epochs
    # [0, ckpt_epoch) — the comparable prefix.
    return {"history": ckpt["history"], "best_epoch": int(ckpt["epoch"]),
            "metrics": metrics, "exp_dir": str(exp_dir)}


def run_ours_resnet3d(data_dir: Path, sd_path: Path, workdir: Path,
                      epochs: int, timeout_s: int = 3600) -> dict:
    logs = workdir / "ours_resnet3d_logs"
    argv = ["--model", "resnet3d", "--data_dir", str(data_dir),
            "--log_dir", str(logs),
            "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
            "--epochs", str(epochs), "--patience", "99",
            "--torch_weights", str(sd_path), "--dropout", "0.0",
            "--learning_rate", "0.001", "--seed", "42"]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from laryngeal_tpu.cli.main import main; "
            f"main({argv!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", LARYNGEAL_PRETRAINED="0",
               JAX_PLATFORMS="cpu", LARYNGEAL_NO_AUGMENT="1")
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(workdir),
                          env=env, timeout=timeout_s, capture_output=True,
                          text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"ours resnet3d failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")

    exp_dir = _newest(logs, "resnet3d-classifier-*")
    history = json.loads((exp_dir / "training_history.json").read_text())
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    best = json.loads((exp_dir / "best_model" / "metadata.json").read_text())
    return {"history": history, "best_epoch": int(best["epoch"]),
            "metrics": metrics, "exp_dir": str(exp_dir)}


def make_lstm_weights(out_dir: Path) -> Path:
    """Seeded full VideoResNet50LSTM state dict, built by importing the
    REFERENCE's own model class (``resnet50-2d-lstm/src/models/model.py``)
    with the torchvision stub on path — zero reimplementation drift; the
    trunk is random (weights download ignored by the stub, fine for
    eval-mode A/B where the checkpoint overrides everything)."""
    out_dir.mkdir(parents=True, exist_ok=True)
    sd_path = out_dir / "lstm_sd.pth"
    code = ("import torch; torch.manual_seed(0); "
            "from src.models.model import VideoResNet50LSTM; "
            "m = VideoResNet50LSTM(hidden_size=256, num_layers=2, dropout=0.5); "
            # BN running stats default to (0, 1); perturb so eval-mode
            # normalization is non-trivial (same trick as the parity tests).
            "import torch.nn as nn\n"
            "with torch.no_grad():\n"
            "    for mod in m.modules():\n"
            "        if isinstance(mod, nn.BatchNorm2d):\n"
            "            mod.running_mean.normal_(0, 0.05)\n"
            "            mod.running_var.uniform_(0.7, 1.4)\n"
            f"torch.save(m.state_dict(), {str(sd_path)!r})\n")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "resnet50-2d-lstm"), str(STUBS)])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"lstm weight build failed:\n{proc.stderr[-2000:]}")
    return sd_path


def run_reference_lstm_eval(data_dir: Path, sd_path: Path, workdir: Path,
                            timeout_s: int = 3600) -> dict:
    """The unmodified ``resnet50-2d-lstm/main.py`` in its own eval-only mode
    (--checkpoint_path, main.py:180-183): decode -> eval transforms -> model
    -> full sklearn metric suite -> test_metrics.json. Eval is deterministic
    (no augmentation/dropout/shuffle), so this A/B has no RNG caveats."""
    logs = workdir / "ref_lstm_logs"
    models = workdir / "ref_lstm_models"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "resnet50-2d-lstm"), str(STUBS)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
               LARYNGEAL_STUB_DECODE="1")
    cmd = [sys.executable, str(REFERENCE / "resnet50-2d-lstm" / "main.py"),
           "--data_dir", str(data_dir),
           "--log_dir", str(logs), "--model_dir", str(models),
           "--sequence_length", str(NUM_FRAMES),
           "--batch_size", str(BATCH), "--num_workers", "0",
           "--checkpoint_path", str(sd_path)]
    proc = subprocess.run(cmd, cwd=str(workdir), env=env, timeout=timeout_s,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference resnet50_lstm failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
    exp_dir = _newest(logs, "resnet50_lstm_enhanced_*")
    metrics = json.loads((exp_dir / "test_metrics.json").read_text())
    return {"metrics": metrics, "exp_dir": str(exp_dir)}


def run_ours_lstm_eval(data_dir: Path, sd_path: Path, workdir: Path,
                       timeout_s: int = 3600) -> dict:
    logs = workdir / "ours_lstm_logs"
    argv = ["--model", "resnet50_lstm", "--data_dir", str(data_dir),
            "--log_dir", str(logs),
            "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
            "--torch_weights", str(sd_path), "--skip_train",
            "--epochs", "1", "--seed", "42"]
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
            f"ours resnet50_lstm failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
    exp_dir = _newest(logs, "resnet50_lstm-classifier-*")
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    return {"metrics": metrics, "exp_dir": str(exp_dir)}


def compare_eval(ref: dict, ours: dict, notes: str = "") -> dict:
    """Metrics-only comparison for eval-mode A/Bs (no training history)."""
    import numpy as np

    out = {"eval_only": True, "notes": notes}
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


def make_swin_weights(out_dir: Path) -> Path:
    """Seeded Swin3D-T + replaced 2-class head, built by the REFERENCE's own
    ``create_model`` (videoswintransformer/.../models/swin3d.py:7-53) with
    the torchvision stub on path."""
    out_dir.mkdir(parents=True, exist_ok=True)
    sd_path = out_dir / "swin_sd.pth"
    code = ("import torch, logging; torch.manual_seed(0); "
            "from swin_video_classifier.models.swin3d import create_model; "
            "m = create_model(logging.getLogger(), model_size='tiny', "
            "pretrained=False, num_classes=2); "
            f"torch.save(m.state_dict(), {str(sd_path)!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "videoswintransformer"), str(STUBS)])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"swin weight build failed:\n{proc.stderr[-2000:]}")
    return sd_path


def run_swin_inference_ab(workdir: Path) -> dict:
    """The swin family has no eval-only training mode, but its
    ``inference.py`` is a complete pipeline (decode -> transforms -> Swin3D
    -> prediction JSON). Run it UNMODIFIED per test video against our
    ``cli.inference`` from identical weights and compare predicted class +
    confidence per video. Deterministic (eval mode, uniform sampling)."""
    workdir.mkdir(parents=True, exist_ok=True)
    data = make_resnet3d_dataset(workdir / "data")
    sd = make_swin_weights(workdir / "weights")

    # Ours: convert once to an orbax checkpoint, then batch-infer.
    ckpt = workdir / "ours_ckpt"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", JAX_PLATFORMS="cpu", LARYNGEAL_PRETRAINED="0")
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.argv = ['port_weights', '--model', 'swin3d', "
            f"'--torch_weights', {str(sd)!r}, '--output', {str(ckpt)!r}, "
            f"'--num_frames', '{NUM_FRAMES}', '--model_size', 'tiny']; "
            "import runpy; runpy.run_path("
            f"{str(REPO / 'scripts' / 'port_weights.py')!r}, "
            "run_name='__main__')")
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(f"swin port failed:\n{proc.stderr[-3000:]}")

    videos = sorted((data / "test").rglob("*.mp4"))
    ref_env = os.environ.copy()
    ref_env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "videoswintransformer"), str(STUBS)])
    ref_env.update(MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
                   LARYNGEAL_STUB_DECODE="1")
    rows = []
    for v in videos:
        ref_logs = workdir / "ref_logs"
        proc = subprocess.run(
            [sys.executable,
             str(REFERENCE / "videoswintransformer" / "inference.py"),
             "--video_path", str(v), "--model_path", str(sd),
             "--num_frames", str(NUM_FRAMES), "--log_dir", str(ref_logs)],
            cwd=str(workdir), env=ref_env, capture_output=True, text=True,
            timeout=900)
        if proc.returncode != 0:
            raise RuntimeError(
                f"reference swin inference failed on {v.name}:\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        res = json.loads(_newest(
            ref_logs, f"inference-swin3d-tiny-*/inference_results/"
            f"{v.stem}_result.json").read_text())

        ours_logs = workdir / "ours_logs"
        code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
                "from laryngeal_tpu.cli.inference import main; "
                f"main(['--model', 'swin3d', '--model_path', {str(ckpt)!r}, "
                f"'--video_path', {str(v)!r}, '--num_frames', "
                f"'{NUM_FRAMES}', '--log_dir', {str(ours_logs)!r}])")
        proc = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True, timeout=900)
        if proc.returncode != 0:
            raise RuntimeError(
                f"ours swin inference failed on {v.name}:\n"
                f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        ours = json.loads(_newest(
            ours_logs, f"**/inference_results/{v.stem}_result.json"
        ).read_text())
        rows.append({
            "video": v.name,
            "ref_class": res["predicted_class"],
            "ours_class": ours["predicted_class"],
            # The reference spells it 'non-referral'; ours follows the
            # training dirs ('non_referral') — normalize for comparison.
            "class_match": (res["predicted_class"].replace("-", "_")
                            == ours["predicted_class"].replace("-", "_")),
            "ref_confidence": round(float(res["confidence"]), 6),
            "ours_confidence": round(float(ours["confidence"]), 6),
            "confidence_delta": round(abs(float(res["confidence"])
                                          - float(ours["confidence"])), 6),
        })
    return {"inference_only": True, "videos": rows,
            "all_classes_match": all(r["class_match"] for r in rows),
            "max_confidence_delta": max(r["confidence_delta"] for r in rows)}


# ---------------------------------------------------------------------------
# Whole-TRAIN-loop A/Bs for the two loop-divergent trainers (round-3 VERDICT
# next #4): resnet50_lstm (composite-score checkpointing + per-epoch wandb +
# ReduceLROnPlateau-on-AUROC, resnet50-2d-lstm/src/trainer/trainer.py:99-122,
# 252,264-275) and swin3d (constructs EarlyStopping the loop never consults
# -> always runs full epochs, videoswintransformer/.../trainers/trainer.py:
# 37-44 + its train() loop).


def make_train_ab_dataset(root: Path) -> Path:
    """Same identity-round-trip recipe as make_resnet3d_dataset, but val=4:
    the lstm reference's val DataLoader uses drop_last=True
    (resnet50-2d-lstm/main.py:165-167), so the val split must fill a whole
    batch or the validation phase sees zero samples."""
    from laryngeal_tpu.data.synthetic import make_synthetic_dataset

    return make_synthetic_dataset(
        str(root), {"train": 4, "val": 4, "test": 4}, num_frames=NUM_FRAMES,
        h=IMAGE, w=IMAGE, fps=30.0, seed=13, varied_lengths=False)


def capture_lstm_train_init(out_dir: Path) -> Path:
    """Reproduce the EXACT init the unmodified lstm main.py trains from:
    it calls set_seed(SEED=42) (main.py:69, src/config/config.py:4) and
    constructs VideoResNet50LSTM as the first torch-RNG consumer (datasets,
    visualizations and dataloaders draw no torch randomness under uniform
    sampling), so replaying set_seed -> ctor yields the identical state
    dict, which is then fed to OUR CLI via --torch_weights."""
    out_dir.mkdir(parents=True, exist_ok=True)
    sd_path = out_dir / "lstm_train_sd.pth"
    code = ("import torch; "
            "from src.utils.logging_utils import set_seed; "
            "from src.config.config import SEED; "
            "set_seed(SEED); "
            "from src.models.model import VideoResNet50LSTM; "
            "m = VideoResNet50LSTM(hidden_size=256, num_layers=2, "
            "dropout=0.0); "
            f"torch.save(m.state_dict(), {str(sd_path)!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "resnet50-2d-lstm"), str(STUBS)])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(
            f"lstm train-init capture failed:\n{proc.stderr[-2000:]}")
    return sd_path


def _parse_save_epochs(log_text: str, pattern: str) -> list:
    import re

    return [int(m.group(1)) for m in re.finditer(pattern, log_text)]


def run_reference_lstm_train(data_dir: Path, workdir: Path, epochs: int,
                             timeout_s: int = 7200) -> dict:
    """The unmodified ``resnet50-2d-lstm/main.py`` in TRAIN mode: BCE with
    pos_weight 1.5*n0/n1, masked Adam over the unfrozen params,
    composite-score model selection (trainer.py:99-122), per-epoch wandb
    logging, ReduceLROnPlateau(mode=max on val_auroc, factor .5, patience 5,
    trainer.py:50-52,252). The wandb stub records the reference's own
    per-epoch log stream (incl. learning_rate) to JSONL; save events come
    from its experiment log."""
    logs = workdir / "ref_lstm_train_logs"
    models = workdir / "ref_lstm_train_models"
    wandb_jsonl = workdir / "ref_lstm_wandb.jsonl"
    if wandb_jsonl.exists():
        wandb_jsonl.unlink()
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "resnet50-2d-lstm"), str(STUBS)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
               LARYNGEAL_STUB_DECODE="1", LARYNGEAL_STUB_DETERMINISTIC="1",
               LARYNGEAL_STUB_WANDB_JSONL=str(wandb_jsonl))
    cmd = [sys.executable, str(REFERENCE / "resnet50-2d-lstm" / "main.py"),
           "--data_dir", str(data_dir),
           "--log_dir", str(logs), "--model_dir", str(models),
           "--sequence_length", str(NUM_FRAMES),
           "--batch_size", str(BATCH), "--num_workers", "0",
           "--epochs", str(epochs), "--patience", "99",
           "--dropout", "0.0", "--learning_rate", "0.001",
           "--loss_weight", "0.3"]
    proc = subprocess.run(cmd, cwd=str(workdir), env=env, timeout=timeout_s,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference lstm train failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
    exp_dir = _newest(logs, "resnet50_lstm_enhanced_*")
    rows = [json.loads(ln) for ln in wandb_jsonl.read_text().splitlines()]
    epoch_rows = [r for r in rows if "epoch" in r and "val_loss" in r]
    history = {k: [r[k] for r in epoch_rows]
               for k in ("train_loss", "val_loss", "train_acc", "val_acc",
                         "train_auroc", "val_auroc", "learning_rate")}
    log_text = "\n".join(p.read_text() for p in exp_dir.glob("*.log"))
    save_epochs = _parse_save_epochs(
        log_text, r"Saving best model at epoch (\d+)")
    metrics = json.loads((exp_dir / "test_metrics.json").read_text())
    return {"history": history, "save_epochs": save_epochs,
            "best_epoch": save_epochs[-1] if save_epochs else None,
            "metrics": metrics, "exp_dir": str(exp_dir)}


def run_ours_lstm_train(data_dir: Path, sd_path: Path, workdir: Path,
                        epochs: int, timeout_s: int = 7200) -> dict:
    logs = workdir / "ours_lstm_train_logs"
    argv = ["--model", "resnet50_lstm", "--data_dir", str(data_dir),
            "--log_dir", str(logs),
            "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
            "--epochs", str(epochs), "--patience", "99",
            "--torch_weights", str(sd_path), "--dropout", "0.0",
            "--learning_rate", "0.001", "--loss_weight", "0.3",
            "--seed", "42"]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from laryngeal_tpu.cli.main import main; "
            f"main({argv!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", LARYNGEAL_PRETRAINED="0",
               JAX_PLATFORMS="cpu", LARYNGEAL_NO_AUGMENT="1")
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(workdir),
                          env=env, timeout=timeout_s, capture_output=True,
                          text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"ours lstm train failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
    exp_dir = _newest(logs, "resnet50_lstm-classifier-*")
    history = json.loads((exp_dir / "training_history.json").read_text())
    history["learning_rate"] = history.get("lr", [])
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    best = json.loads((exp_dir / "best_model" / "metadata.json").read_text())
    log_text = "\n".join(p.read_text() for p in exp_dir.glob("*.log"))
    save_epochs = _parse_save_epochs(
        log_text, r"Saved best model \(epoch (\d+)\)")
    return {"history": history, "save_epochs": save_epochs,
            "best_epoch": int(best["epoch"]) + 1,  # ref logs are 1-based
            "metrics": metrics, "exp_dir": str(exp_dir)}


def capture_swin_train_init(out_dir: Path) -> Path:
    """Reproduce the unmodified swin main.py's init: it seeds
    torch/np/random with args.seed (main.py:73-76) and creates the model
    BEFORE the dataloaders (main.py:90-101), so manual_seed(42) ->
    create_model(pretrained=False) replays the identical state dict."""
    out_dir.mkdir(parents=True, exist_ok=True)
    sd_path = out_dir / "swin_train_sd.pth"
    code = ("import torch, numpy as np, random, logging; "
            "torch.manual_seed(42); np.random.seed(42); random.seed(42); "
            "from swin_video_classifier.models.swin3d import create_model; "
            "m = create_model(logging.getLogger(), model_size='tiny', "
            "pretrained=False, num_classes=2); "
            f"torch.save(m.state_dict(), {str(sd_path)!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "videoswintransformer"), str(STUBS)])
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=600)
    if proc.returncode != 0:
        raise RuntimeError(
            f"swin train-init capture failed:\n{proc.stderr[-2000:]}")
    return sd_path


def run_reference_swin_train(data_dir: Path, workdir: Path, epochs: int,
                             timeout_s: int = 14400) -> dict:
    """The unmodified ``videoswintransformer/main.py`` TRAIN loop: AdamW,
    CE loss, loss+acc-threshold selection, and the family quirk under test —
    EarlyStopping is constructed but never consulted, so the loop always
    runs all --epochs (trainer.py:37-44 + train()). History + best epoch
    come from the checkpoint the trainer itself persists
    (_save_best_model, trainer.py:184-201)."""
    logs = workdir / "ref_swin_train_logs"
    models = workdir / "ref_swin_train_models"
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REFERENCE / "videoswintransformer"), str(STUBS)]
        + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", CUDA_VISIBLE_DEVICES="",
               LARYNGEAL_STUB_DECODE="1", LARYNGEAL_STUB_DETERMINISTIC="1")
    cmd = [sys.executable, str(REFERENCE / "videoswintransformer" / "main.py"),
           "--data_dir", str(data_dir),
           "--log_dir", str(logs), "--model_dir", str(models),
           "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
           "--num_workers", "0", "--epochs", str(epochs),
           "--model_size", "tiny", "--learning_rate", "0.0001",
           "--weight_decay", "0.05", "--seed", "42",
           "--patience", "2"]  # patience << epochs: proves the loop ignores it
    proc = subprocess.run(cmd, cwd=str(workdir), env=env, timeout=timeout_s,
                          capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"reference swin train failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")

    import torch

    exp_dir = _newest(logs, "swin3d-tiny-*")
    ckpt = torch.load(_newest(models, "*_swin3d-tiny_best_model.pth"),
                      map_location="cpu", weights_only=False)
    metrics = json.loads((exp_dir / "test_metrics.json").read_text())
    import re

    log_text = "\n".join(p.read_text() for p in exp_dir.glob("*.log"))
    n_saves = len(re.findall(r"New best model saved!", log_text))
    # epochs_ran from the LOG, not the checkpoint: _save_best_model runs
    # inside the val phase BEFORE that epoch's history append, so the
    # persisted history covers [0, best_epoch) only.
    epochs_ran = len(set(re.findall(r"Epoch (\d+)/\d+ \| Val Loss", log_text)))
    # Full per-epoch series, also from the log (the trainer only persists
    # history inside best-model checkpoints).
    history = {"train_loss": [], "val_loss": [], "train_acc": [],
               "val_acc": []}
    for m in re.finditer(
            r"Epoch \d+/\d+ \| (Train|Val) Loss: ([\d.]+) Acc: ([\d.]+)",
            log_text):
        phase = m.group(1).lower()
        history[f"{phase}_loss"].append(float(m.group(2)))
        history[f"{phase}_acc"].append(float(m.group(3)))
    return {"history": history, "best_epoch": int(ckpt["epoch"]) + 1,
            "epochs_ran": epochs_ran,
            "n_saves": n_saves, "metrics": metrics,
            "exp_dir": str(exp_dir)}


def run_ours_swin_train(data_dir: Path, sd_path: Path, workdir: Path,
                        epochs: int, timeout_s: int = 14400) -> dict:
    logs = workdir / "ours_swin_train_logs"
    argv = ["--model", "swin3d", "--model_size", "tiny",
            "--data_dir", str(data_dir), "--log_dir", str(logs),
            "--num_frames", str(NUM_FRAMES), "--batch_size", str(BATCH),
            "--epochs", str(epochs), "--patience", "2",
            "--torch_weights", str(sd_path), "--dropout", "0.0",
            "--stochastic_depth", "0.0",
            "--learning_rate", "0.0001", "--weight_decay", "0.05",
            "--seed", "42"]
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from laryngeal_tpu.cli.main import main; "
            f"main({argv!r})")
    env = os.environ.copy()
    env["PYTHONPATH"] = os.pathsep.join(
        [str(REPO)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env.update(MPLBACKEND="Agg", LARYNGEAL_PRETRAINED="0",
               JAX_PLATFORMS="cpu", LARYNGEAL_NO_AUGMENT="1")
    proc = subprocess.run([sys.executable, "-c", code], cwd=str(workdir),
                          env=env, timeout=timeout_s, capture_output=True,
                          text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"ours swin train failed (rc={proc.returncode}):\n"
            f"--- stdout ---\n{proc.stdout[-4000:]}\n"
            f"--- stderr ---\n{proc.stderr[-4000:]}")
    exp_dir = _newest(logs, "swin3d-classifier-*")
    history = json.loads((exp_dir / "training_history.json").read_text())
    metrics = json.loads((exp_dir / "test_metrics_uniform.json").read_text())
    best = json.loads((exp_dir / "best_model" / "metadata.json").read_text())
    log_text = "\n".join(p.read_text() for p in exp_dir.glob("*.log"))
    save_epochs = _parse_save_epochs(
        log_text, r"Saved best model \(epoch (\d+)\)")
    return {"history": history, "best_epoch": int(best["epoch"]) + 1,
            "epochs_ran": len(history["train_loss"]),
            "n_saves": len(save_epochs), "metrics": metrics,
            "exp_dir": str(exp_dir)}


def compare_train_loop(ref: dict, ours: dict, series, notes: str = "") -> dict:
    """Loop-level comparison: per-epoch metric series, selection (save)
    events, best epoch, lr trajectory, final test metrics."""
    import numpy as np

    out = {"train_loop": True, "notes": notes,
           "epochs": len(ref["history"]["train_loss"])}
    for k in series:
        r = np.asarray(ref["history"].get(k, []), dtype=float)
        o = np.asarray(ours["history"].get(k, []), dtype=float)[:len(r)]
        out[f"{k}_ref"] = [round(x, 6) for x in r.tolist()]
        out[f"{k}_ours"] = [round(x, 6) for x in o.tolist()]
        out[f"{k}_max_abs_delta"] = (round(float(np.abs(r - o).max()), 6)
                                     if len(o) == len(r) and len(r) else None)
    if "save_epochs" in ref:
        out["save_epochs_ref"] = ref["save_epochs"]
        out["save_epochs_ours"] = ours["save_epochs"]
        out["save_epochs_match"] = ref["save_epochs"] == ours["save_epochs"]
    for k in ("epochs_ran", "n_saves"):
        if k in ref:
            out[f"{k}_ref"], out[f"{k}_ours"] = ref[k], ours[k]
    out["best_epoch_ref"] = ref["best_epoch"]
    out["best_epoch_ours"] = ours["best_epoch"]
    out["best_epoch_match"] = ref["best_epoch"] == ours["best_epoch"]
    rm, om = ref["metrics"], ours["metrics"]
    for k in ("accuracy", "f1_score", "auroc"):
        out[f"test_{k}_ref"] = round(float(rm.get(k, float("nan"))), 6)
        out[f"test_{k}_ours"] = round(float(om.get(k, float("nan"))), 6)
    cm_r = np.asarray(rm.get("confusion_matrix", []))
    cm_o = np.asarray(om.get("confusion_matrix", []))
    out["confusion_matrix_ref"] = cm_r.tolist()
    out["confusion_matrix_ours"] = cm_o.tolist()
    return out


def run_ab(variant: str, workdir: Path, epochs: int = 3) -> dict:
    workdir.mkdir(parents=True, exist_ok=True)
    if variant == "resnet50_lstm_train":
        data = make_train_ab_dataset(workdir / "data")
        sd = capture_lstm_train_init(workdir / "weights")
        ref = run_reference_lstm_train(data, workdir, epochs)
        ours = run_ours_lstm_train(data, sd, workdir, epochs)
        return compare_train_loop(
            ref, ours,
            series=("train_loss", "val_loss", "train_acc", "val_acc",
                    "train_auroc", "val_auroc", "learning_rate"),
            notes=(
                "Whole-TRAIN-loop A/B of the reference's unique loop "
                "behavior: composite-score checkpointing (0.3*normalized "
                "loss + 0.7*val_auroc, trainer.py:99-122), per-epoch wandb "
                "stream (recorded verbatim by the stub), and "
                "ReduceLROnPlateau on val_auroc (mode=max, factor 0.5, "
                "patience 5, trainer.py:50-52,252). Identical init "
                "(set_seed(42) replay), frozen random trunk (torchvision "
                "stub; loop behavior, not ImageNet quality, is under "
                "test), dropout 0, deterministic transforms both sides."))
    if variant == "swin3d_train":
        data = make_train_ab_dataset(workdir / "data")
        sd = capture_swin_train_init(workdir / "weights")
        ref = run_reference_swin_train(data, workdir, epochs)
        ours = run_ours_swin_train(data, sd, workdir, epochs)
        return compare_train_loop(
            ref, ours,
            series=("train_loss", "val_loss", "train_acc", "val_acc"),
            notes=(
                "Whole-TRAIN-loop A/B of the swin family quirk: "
                "EarlyStopping is constructed but never consulted "
                "(trainer.py:37-44), so with patience=2 << epochs BOTH "
                "sides must run all epochs (epochs_ran below). Selection "
                "is loss-improved AND acc within 0.02 of best. Identical "
                "init (manual_seed(42) replay of create_model), AdamW "
                "1e-4/wd 0.05, deterministic transforms both sides."))
    if variant == "swin3d":
        return run_swin_inference_ab(workdir)
    if variant == "resnet50_lstm":
        data = make_resnet3d_dataset(workdir / "data")
        sd = make_lstm_weights(workdir / "weights")
        ref = run_reference_lstm_eval(data, sd, workdir)
        ours = run_ours_lstm_eval(data, sd, workdir)
        return compare_eval(ref, ours, notes=(
            "Known reference bug (surfaced by this A/B, verified by "
            "inspection): its per-class metrics block calls "
            "`accuracy_score(mask, preds[mask] == cls_idx)` with a "
            "full-length y_true vs a masked y_pred "
            "(resnet50-2d-lstm/src/evaluators/evaluator.py:131), which "
            "raises inside the try and the except clause zeroes "
            "accuracy/precision/recall on EVERY two-class run "
            "(evaluator.py:142-145) — so the reference's saved accuracy is "
            "always 0.0. AUROC/F1/confusion matrix are computed before that "
            "block and must match exactly; our evaluator computes the real "
            "accuracy."))
    if variant == "resnet3d":
        data = make_resnet3d_dataset(workdir / "data")
        sd = make_resnet3d_weights(workdir / "weights")
        ref = run_reference_resnet3d(data, sd, workdir, epochs)
        ours = run_ours_resnet3d(data, sd, workdir, epochs)
        return compare(ref, ours)
    data = make_dataset(workdir / "data")
    ckpt = make_tiny_checkpoint(workdir / f"tiny_{variant}", variant)
    ref = run_reference(variant, data, ckpt, workdir, epochs)
    ours = run_ours(variant, data, ckpt / "sd.pth", workdir, epochs)
    return compare(ref, ours)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variant", default="both",
                    choices=["vivit", "timesformer", "resnet3d",
                             "resnet50_lstm", "swin3d",
                             "resnet50_lstm_train", "swin3d_train",
                             "both", "all"])
    ap.add_argument("--workdir", default="/tmp/laryngeal_ab")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--report", default=str(REPO / "AB_REPORT.md"))
    args = ap.parse_args()

    variants = {"both": ["vivit", "timesformer"],
                "all": ["vivit", "timesformer", "resnet3d",
                        "resnet50_lstm", "swin3d",
                        "resnet50_lstm_train", "swin3d_train"]}.get(
                    args.variant, [args.variant])
    # Merge with previous runs (JSON sidecar next to the report) so a
    # partial --variant rerun refreshes its section without clobbering the
    # other variants' sections.
    sidecar = Path(args.report).with_suffix(".json")
    had_sidecar = sidecar.exists()
    results = json.loads(sidecar.read_text()) if had_sidecar else {}
    for v in variants:
        print(f"=== A/B {v} ===", flush=True)
        results[v] = run_ab(v, Path(args.workdir) / v, args.epochs)
        print(json.dumps(results[v], indent=2), flush=True)
    sidecar.write_text(json.dumps(results, indent=2))
    report = Path(args.report)
    if report.exists() and not had_sidecar:
        # Report predates the sidecar (older-round sections we can't
        # regenerate): surgically replace/append just this run's sections.
        import re as _re

        text = report.read_text()
        for v in variants:
            tmp = report.parent / (report.name + f".{v}.tmp")
            write_report({v: results[v]}, tmp, args.epochs)
            section = f"## {v}\n" + tmp.read_text().split(f"## {v}\n", 1)[1]
            tmp.unlink()
            pat = _re.compile(rf"## {_re.escape(v)}\n.*?(?=\n## |\Z)",
                              _re.DOTALL)
            if pat.search(text):
                text = pat.sub(lambda _m: section.rstrip("\n") + "\n", text)
            else:
                text = text.rstrip("\n") + "\n\n" + section
        report.write_text(text)
    else:
        write_report(results, report, args.epochs)
    print(f"report -> {args.report}")


if __name__ == "__main__":
    main()
