"""CSV-driven dataset organizer (parity: scripts/organize_dataset.py).

Usage: python scripts/organize_dataset.py --csv_dir D --video_dir V --output_dir O
"""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.ops import organize_from_csv

ap = argparse.ArgumentParser()
ap.add_argument("--csv_dir", required=True)
ap.add_argument("--video_dir", required=True)
ap.add_argument("--output_dir", default="organized_dataset")
args = ap.parse_args()
print(organize_from_csv(args.csv_dir, args.video_dir, args.output_dir))
