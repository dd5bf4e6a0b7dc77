"""IQM filtering driver — mirror a dataset tree keeping only frames with
glottis detections (parity: scripts/yolov5_iqm.py:14-71).

Usage:
    python scripts/yolov5_iqm.py --input_dir DATASET --output_dir OUT \
        [--weights model/yolov5.pt] [--conf 0.25] [--size s]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.preprocess.detector_config import CONF_THRESHOLD, WEIGHTS_PATH
from laryngeal_tpu.preprocess.yolo_roi import YOLODetector


def process_dataset_videos(detector, input_root, output_root, conf_thres, mode):
    input_root, output_root = Path(input_root), Path(output_root)
    results = []
    for video_path in sorted(input_root.rglob("*.mp4")):
        rel = video_path.relative_to(input_root)
        out_dir = output_root / rel.parent
        out_dir.mkdir(parents=True, exist_ok=True)
        print(f"Processing {rel} ...")
        if mode == "roi":
            r = detector.crop_video_roi(str(video_path), video_path.stem,
                                        output_dir=str(out_dir), conf_thres=conf_thres)
        else:
            r = detector.process_video_detected_only_raw(
                str(video_path), video_path.stem, output_dir=str(out_dir),
                conf_thres=conf_thres)
        results.append((str(rel), r.get("status"), r.get("detected_frame_count", 0)))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("--weights", default=None,
                    help=f"detector weights (default: {WEIGHTS_PATH} if present)")
    ap.add_argument("--conf", type=float, default=CONF_THRESHOLD)
    ap.add_argument("--size", default="s")
    ap.add_argument("--mode", choices=["filter", "roi"], default="filter",
                    help="filter = keep detected frames raw (reference IQM); "
                         "roi = crop union glottis box")
    args = ap.parse_args()

    weights = args.weights
    if weights is None and Path(WEIGHTS_PATH).exists():
        weights = WEIGHTS_PATH
    detector = YOLODetector(weights_path=weights, size=args.size)
    results = process_dataset_videos(detector, args.input_dir, args.output_dir,
                                     args.conf, args.mode)
    for rel, status, n in results:
        print(f"{rel}: {status} ({n} detected frames)")


if __name__ == "__main__":
    main()
