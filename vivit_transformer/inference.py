"""Compatibility wrapper — preserves the reference run command

    python vivit_transformer/inference.py --video_path ... --model_path ...

by delegating to the unified TPU framework inference CLI with --model vivit.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.cli.inference import main

if __name__ == "__main__":
    main(model_default="vivit")
