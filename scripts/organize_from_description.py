"""Build the {split}/{referral,non_referral} dataset tree from a
data_description.csv (see data_description/README.md for the schema).

Thin CLI over laryngeal_tpu.data.description.organize_from_description.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--description", required=True,
                    help="data_description.csv path")
    ap.add_argument("--video_dir", required=True,
                    help="directory searched recursively for the CSV's files")
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--fractions", type=float, nargs=3,
                    default=(0.7, 0.15, 0.15), metavar=("TRAIN", "VAL", "TEST"))
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--expected_splits", default=None,
                    help="dataset_splits.csv to verify the produced counts "
                         "against (mismatch is fatal)")
    ap.add_argument("--dry_run", action="store_true",
                    help="plan + verify without copying files")
    args = ap.parse_args()

    from laryngeal_tpu.data.description import organize_from_description

    stats = organize_from_description(
        args.description, args.video_dir, args.output_dir,
        fractions=tuple(args.fractions), seed=args.seed,
        expected_splits_csv=args.expected_splits, copy=not args.dry_run)
    print(json.dumps(stats, indent=2))


if __name__ == "__main__":
    main()
