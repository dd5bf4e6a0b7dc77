"""Dataset artifact management — wandb-backed when available, local otherwise.

Parity: ``scripts/save_dataset_wandb.py:5-101`` (upload dataset dir as a
versioned artifact with split-statistics metadata) and
``scripts/download_artifacts.py:1-4``. wandb is absent in this image, so the
fallback registry is a local ``~/.laryngeal_artifacts`` store with the same
call surface (name/type/metadata + content copy), letting the rest of the
framework treat artifacts uniformly.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime
from pathlib import Path
from typing import Dict, Optional

try:  # pragma: no cover
    import wandb

    HAS_WANDB = True
except Exception:  # pragma: no cover
    wandb = None
    HAS_WANDB = False

DEFAULT_PROJECT = "laryngeal_cancer_video_classification"
LOCAL_STORE = Path(os.environ.get("LARYNGEAL_ARTIFACT_DIR",
                                  ".laryngeal_artifacts"))


def dataset_split_statistics(dataset_dir) -> Dict:
    """Per-split per-class video counts (save_dataset_wandb.py metadata)."""
    stats: Dict = {}
    root = Path(dataset_dir)
    for split_dir in sorted(d for d in root.iterdir() if d.is_dir()):
        stats[split_dir.name] = {
            c.name: len(list(c.glob("*.mp4")))
            for c in sorted(split_dir.iterdir()) if c.is_dir()
        }
    return stats


def save_dataset_artifact(dataset_dir, name: str, artifact_type: str = "dataset",
                          project: Optional[str] = None,
                          description: str = "") -> str:
    """Upload (wandb) or locally register a dataset directory. Returns a
    reference string ('entity/project/name:version' or local path)."""
    metadata = {
        "split_statistics": dataset_split_statistics(dataset_dir),
        "created": datetime.now().isoformat(),
        "description": description,
    }
    project = project or os.environ.get("WANDB_PROJECT", DEFAULT_PROJECT)
    if HAS_WANDB:
        run = wandb.init(project=project, job_type="dataset-upload")
        art = wandb.Artifact(name, type=artifact_type, description=description,
                             metadata=metadata)
        art.add_dir(str(dataset_dir))
        run.log_artifact(art)
        run.finish()
        return f"{project}/{name}:latest"

    store = LOCAL_STORE / project / name
    versions = sorted(int(v.name[1:]) for v in store.glob("v*") if v.name[1:].isdigit())
    version = (versions[-1] + 1) if versions else 0
    dest = store / f"v{version}"
    shutil.copytree(dataset_dir, dest / "data")
    with open(dest / "metadata.json", "w") as fh:
        json.dump(metadata, fh, indent=4)
    (store / "latest").write_text(f"v{version}")
    return str(dest)


def download_dataset_artifact(name: str, project: Optional[str] = None,
                              version: str = "latest") -> str:
    """Resolve an artifact to a local directory path
    (download_artifacts.py:1-4)."""
    project = project or os.environ.get("WANDB_PROJECT", DEFAULT_PROJECT)
    if HAS_WANDB:
        run = wandb.init(project=project, job_type="dataset-download")
        art = run.use_artifact(f"{name}:{version}")
        path = art.download()
        run.finish()
        return path

    store = LOCAL_STORE / project / name
    if version == "latest":
        latest = store / "latest"
        if not latest.exists():
            raise FileNotFoundError(f"No local artifact {project}/{name}")
        version = latest.read_text().strip()
    path = store / version / "data"
    if not path.exists():
        raise FileNotFoundError(f"No local artifact {project}/{name}:{version}")
    return str(path)
