"""Experiment logger — timestamped run dirs with file+console logging.

Parity: ``vivit_transformer/vivit_classifier/utils/logger.py:5-61`` (and the
2d-lstm variant that accepts a pre-built dir,
``resnet50-2d-lstm/src/utils/logger.py:6-95``).
"""

from __future__ import annotations

import logging
from datetime import datetime
from pathlib import Path


class ExperimentLogger:
    def __init__(self, log_dir, prefix: str = "experiment", timestamped: bool = True,
                 filename: str = "experiment.log"):
        base = Path(log_dir)
        if timestamped:
            stamp = datetime.now().strftime("%Y%m%d_%H%M%S")
            self.experiment_dir = base / f"{prefix}-{stamp}"
        else:
            self.experiment_dir = base
        self.experiment_dir.mkdir(parents=True, exist_ok=True)

        self.logger = logging.getLogger(str(self.experiment_dir / filename))
        self.logger.setLevel(logging.INFO)
        self.logger.handlers.clear()
        fh = logging.FileHandler(self.experiment_dir / filename)
        ch = logging.StreamHandler()
        fmt = logging.Formatter("%(asctime)s - %(levelname)s - %(message)s")
        fh.setFormatter(fmt)
        ch.setFormatter(fmt)
        self.logger.addHandler(fh)
        self.logger.addHandler(ch)
        self.logger.propagate = False

    def get_logger(self) -> logging.Logger:
        return self.logger

    def get_experiment_dir(self) -> Path:
        return self.experiment_dir

    def get_model_path(self, name: str = "best_model") -> Path:
        d = self.experiment_dir / "models"
        d.mkdir(exist_ok=True)
        return d / name

    def get_metrics_path(self, name: str) -> Path:
        return self.experiment_dir / name

    def get_visualization_dir(self) -> Path:
        d = self.experiment_dir / "visualizations"
        d.mkdir(exist_ok=True)
        return d
