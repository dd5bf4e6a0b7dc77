"""Experiment tracking — wandb when available, JSONL fallback otherwise.

The reference logs per-epoch metrics to wandb only in the 2d-lstm trainer
(``resnet50-2d-lstm/src/trainer/trainer.py:133-138,264-275,390-396``; project
env ``WANDB_PROJECT`` default ``laryngeal_cancer_video_classification``).
wandb is not installed in this image, so the tracker degrades to an append-only
``metrics.jsonl`` in the experiment dir — same call surface.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, Optional

try:  # pragma: no cover
    import wandb as _wandb

    HAS_WANDB = True
except Exception:  # pragma: no cover
    _wandb = None
    HAS_WANDB = False

DEFAULT_PROJECT = "laryngeal_cancer_video_classification"


class Tracker:
    def __init__(self, enabled: bool = True, project: Optional[str] = None,
                 config: Optional[Dict] = None, out_dir=None, run_name=None):
        self.enabled = enabled
        self._run = None
        self._file = None
        if not enabled:
            return
        project = project or os.environ.get("WANDB_PROJECT", DEFAULT_PROJECT)
        if HAS_WANDB:
            self._run = _wandb.init(project=project, config=config or {}, name=run_name)
        elif out_dir is not None:
            path = Path(out_dir) / "metrics.jsonl"
            self._file = open(path, "a")
            self._file.write(json.dumps({"_config": config or {}, "_project": project}) + "\n")

    def log(self, metrics: Dict, step: Optional[int] = None) -> None:
        if not self.enabled:
            return
        if self._run is not None:
            self._run.log(metrics, step=step)
        elif self._file is not None:
            rec = dict(metrics)
            if step is not None:
                rec["_step"] = step
            self._file.write(json.dumps(rec, default=float) + "\n")
            self._file.flush()

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
        if self._file is not None:
            self._file.close()
            self._file = None
