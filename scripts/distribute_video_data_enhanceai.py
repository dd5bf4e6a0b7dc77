"""W&B table JSON -> deduped binary-label CSV
(parity: scripts/distribute_video_data_enhanceai.py; Grade 1 -> 0, 2-3 -> 1).

Usage: python scripts/distribute_video_data_enhanceai.py --json_dir D --out_dir O
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.ops import wandb_table_to_csv

ap = argparse.ArgumentParser()
ap.add_argument("--json_dir", required=True)
ap.add_argument("--out_dir", default=".")
args = ap.parse_args()
for split in ("train", "val", "test"):
    p = Path(args.json_dir) / f"{split}.table.json"
    if p.exists():
        out = Path(args.out_dir) / f"{split}.table_unique.csv"
        n = wandb_table_to_csv(p, out)
        print(f"{split}: {n} unique videos -> {out}")
