"""CSV -> flat referral/non_referral copy (parity: scripts/referral_videos_split.py)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.ops import flat_class_split

ap = argparse.ArgumentParser()
ap.add_argument("--csv", required=True)
ap.add_argument("--video_dir", required=True)
ap.add_argument("--output_dir", default="data")
args = ap.parse_args()
print(flat_class_split(args.csv, args.video_dir, args.output_dir))
