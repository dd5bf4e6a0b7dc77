"""Standalone sampling-method comparison tool.

Parity: root ``visualize_sampling.py`` (true-frame-count probe :28-39,
per-method index generation :105-178, comparison figure :180-287): renders a
figure with one row per sampling method — timeline of chosen indices (with
window shading for random_window) above a grid of the sampled frames.

Usage:
    python visualize_sampling.py --video_path V --num_frames 8 \
        [--methods uniform random random_window] [--output out.png]
"""

from __future__ import annotations

import argparse
import random
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

from laryngeal_tpu.data.samplers import sample_indices
from laryngeal_tpu.data.video import decode_frames, get_video_properties


def true_frame_count(video_path) -> int:
    """Sequential decode count — metadata frame counts lie for some codecs
    (reference visualize_sampling.py:28-39)."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    n = 0
    while cap.read()[0]:
        n += 1
    cap.release()
    return n


def visualize_sampling_methods(video_path, num_frames=8,
                               methods=("uniform", "random", "random_window"),
                               output=None, seed=42, frames_to_show=6,
                               exact_count=False):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    total = true_frame_count(video_path) if exact_count else get_video_properties(video_path)[0]
    rows = len(methods)
    fig = plt.figure(figsize=(3 * frames_to_show, 3.2 * rows))

    for mi, method in enumerate(methods):
        indices = sample_indices(method, total, num_frames, random.Random(seed))
        ax = fig.add_subplot(rows * 2, 1, mi * 2 + 1)
        ax.vlines(indices, 0, 1, colors="r", lw=1.5)
        if method == "random_window":
            w = total / num_frames
            for i in range(num_frames):
                ax.axvspan(i * w, (i + 1) * w,
                           alpha=0.12 if i % 2 == 0 else 0.05, color="b")
        ax.set_xlim(0, max(total - 1, 1))
        ax.set_yticks([])
        ax.set_title(f"{method}: {sorted(indices)[:frames_to_show]}... "
                     f"of {total} frames", fontsize=9, loc="left")

        frames = decode_frames(video_path, sorted(indices)[:frames_to_show])
        for fi in range(min(frames_to_show, len(frames))):
            axf = fig.add_subplot(rows * 2, frames_to_show,
                                  (mi * 2 + 1) * frames_to_show + fi + 1)
            axf.imshow(frames[fi])
            axf.axis("off")
            axf.set_title(f"idx {sorted(indices)[fi]}", fontsize=7)

    fig.tight_layout()
    out = output or f"sampling_comparison_{Path(str(video_path)).stem}.png"
    fig.savefig(out, dpi=110)
    plt.close(fig)
    print(f"Saved {out}")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_path", required=True)
    ap.add_argument("--num_frames", type=int, default=8)
    ap.add_argument("--methods", nargs="+",
                    default=["uniform", "random", "random_window"])
    ap.add_argument("--output", default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--exact_count", action="store_true",
                    help="sequentially decode to get the true frame count")
    args = ap.parse_args()
    visualize_sampling_methods(args.video_path, args.num_frames, args.methods,
                               args.output, args.seed,
                               exact_count=args.exact_count)
