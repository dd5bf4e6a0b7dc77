"""Stratified 70/15/15 dataset splitter (parity: scripts/video_data_distribution.py).

Usage: python scripts/video_data_distribution.py --source_dir SRC --output_dir OUT
"""
import argparse, json, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.ops import create_balanced_splits

ap = argparse.ArgumentParser()
ap.add_argument("--source_dir", required=True)
ap.add_argument("--output_dir", default="dataset_balanced")
ap.add_argument("--seed", type=int, default=42)
args = ap.parse_args()
stats = create_balanced_splits(args.source_dir, args.output_dir, seed=args.seed)
print(json.dumps(stats, indent=2))
