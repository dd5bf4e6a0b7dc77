"""Download/resolve a dataset artifact (parity: scripts/download_artifacts.py)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.artifacts import download_dataset_artifact

ap = argparse.ArgumentParser()
ap.add_argument("--name", default="laryngeal_dataset_iqm_filtered")
ap.add_argument("--version", default="latest")
args = ap.parse_args()
print(download_dataset_artifact(args.name, version=args.version))
