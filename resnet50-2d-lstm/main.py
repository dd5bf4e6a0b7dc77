"""Compatibility wrapper — preserves the reference run command

    python resnet50-2d-lstm/main.py --data_dir ... [reference flags]

by delegating to the unified TPU framework CLI with --model resnet50_lstm.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.cli.main import main

if __name__ == "__main__":
    main(model_default="resnet50_lstm")
