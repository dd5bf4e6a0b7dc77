"""Recursive file/folder counter (parity: scripts/file_counting.py)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.ops import count_files

ap = argparse.ArgumentParser()
ap.add_argument("directory")
ap.add_argument("--no-recursive", action="store_true")
args = ap.parse_args()
print(count_files(args.directory, recursive=not args.no_recursive))
