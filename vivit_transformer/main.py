"""Compatibility wrapper — preserves the reference run command

    python vivit_transformer/main.py --data_dir ... [reference flags]

by delegating to the unified TPU framework CLI with --model vivit.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.cli.main import main

if __name__ == "__main__":
    main(model_default="vivit")
