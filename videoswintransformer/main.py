"""Compatibility wrapper — preserves the reference run command

    python videoswintransformer/main.py --data_dir ... [reference flags]

by delegating to the unified TPU framework CLI with --model swin3d.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.cli.main import main

if __name__ == "__main__":
    main(model_default="swin3d")
