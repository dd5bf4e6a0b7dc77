"""Detector configuration constants — parity with src/config.py:1-13."""

from pathlib import Path

BASE_DIR = Path(__file__).resolve().parent.parent.parent
WEIGHTS_PATH = str(BASE_DIR / "model" / "yolov5.pt")  # src/config.py:9 (not vendored)
DATA_PATH = str(BASE_DIR / "model" / "data.yaml")
DEVICE = "0"
CONF_THRESHOLD = 0.25
IOU_THRESHOLD = 0.45
