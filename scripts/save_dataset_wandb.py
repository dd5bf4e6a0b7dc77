"""Upload a dataset directory as a versioned artifact
(parity: scripts/save_dataset_wandb.py; local store when wandb is absent)."""
import argparse, sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from laryngeal_tpu.data.artifacts import save_dataset_artifact

ap = argparse.ArgumentParser()
ap.add_argument("--dataset_dir", required=True)
ap.add_argument("--name", default="laryngeal_dataset_iqm_filtered")
ap.add_argument("--description", default="")
args = ap.parse_args()
print(save_dataset_artifact(args.dataset_dir, args.name, description=args.description))
