"""Detector smoke script — exercise all process modes on one video
(parity: scripts/test_yolov5.py:12-82).

Usage: python scripts/test_yolov5.py VIDEO [--weights W] [--size s]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from laryngeal_tpu.preprocess.yolo_roi import YOLODetector


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--size", default="s")
    ap.add_argument("--out", default="output")
    args = ap.parse_args()

    det = YOLODetector(weights_path=args.weights, size=args.size)
    stem = Path(args.video).stem
    print("process_video ...")
    print(det.process_video(args.video, f"{stem}_annotated", save_path=args.out)["total_frames"])
    print("process_video_detected_only ...")
    print(det.process_video_detected_only(args.video, f"{stem}_detected", args.out)["detected_frame_count"])
    print("process_video_detected_only_raw ...")
    print(det.process_video_detected_only_raw(args.video, f"{stem}_raw", args.out)["detected_frame_count"])
    print("crop_video_roi ...")
    print(det.crop_video_roi(args.video, stem, args.out).get("status"))


if __name__ == "__main__":
    main()
