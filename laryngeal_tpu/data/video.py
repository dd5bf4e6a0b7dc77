"""Host-side video decode (OpenCV-backed, import-gated).

Parity surface: the reference decodes with PyTorchVideo/PyAV and falls back to
OpenCV seek/read (``vivit_transformer/.../data_config/dataset.py:198-381``).
Neither ``av`` nor ``pytorchvideo`` exists in this image, and index-based
OpenCV decode is simpler and *more exact* than the reference's
get_clip-seconds dance (which assumes fps=30 in places —
``resnet50-2d-lstm/src/data_config/dataset.py:28,192``, a documented
reference bug we do not replicate). So OpenCV single-pass decode is the
primary path here, with the reference's robustness ladder preserved:
seek -> sequential re-read -> gray placeholder frame.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

try:  # pragma: no cover - exercised implicitly
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False

logger = logging.getLogger(__name__)


def _require_cv2():
    if not HAS_CV2:
        raise ImportError(
            "OpenCV (cv2) is required for video decode; install opencv-python "
            "or feed pre-decoded .npy clips instead."
        )


def get_video_properties(path) -> Tuple[int, float, float, int, int]:
    """(total_frames, fps, duration_sec, width, height) — reference
    ``vivit_transformer/.../dataset.py:114-127``."""
    _require_cv2()
    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise ValueError(f"Could not open video: {path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    fps = cap.get(cv2.CAP_PROP_FPS)
    if not fps or fps <= 0 or np.isnan(fps):
        fps = 30.0  # reference fallback (videoswintransformer/.../dataset.py:108-112)
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    cap.release()
    return total, float(fps), total / float(fps), w, h


def verify_video_integrity(path) -> bool:
    """Openable + >=1 readable frame + positive frame count
    (reference dataset.py:48-72)."""
    if not HAS_CV2:
        return Path(path).exists()
    try:
        cap = cv2.VideoCapture(str(path))
        if not cap.isOpened():
            return False
        ret, _ = cap.read()
        if not ret:
            cap.release()
            return False
        total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        return total > 0
    except Exception:
        return False


def rgb_to_yuv420(frames_rgb: np.ndarray) -> np.ndarray:
    """RGB uint8 (T,H,W,3) -> I420 planar uint8 (T, H*3/2, W) via cv2.

    The compact wire format for host->device clip transfers (half the bytes
    of RGB24); expand on-device with preprocess.transforms.yuv420_to_rgb."""
    _require_cv2()
    return np.stack([
        cv2.cvtColor(f, cv2.COLOR_RGB2YUV_I420) for f in frames_rgb
    ])


def decode_frames(
    path,
    indices: Sequence[int],
    resize_to: Optional[Tuple[int, int]] = None,
) -> np.ndarray:
    """Decode the frames at `indices` (may repeat, assumed non-decreasing after
    sort) as RGB uint8 (N, H, W, C).

    Single sequential pass with grab()-skipping — decodes each needed frame
    exactly once regardless of duplicates, unlike the reference's per-index
    seek loop. Unreadable frames become gray placeholders (value 127,
    reference dataset.py:341-355).

    resize_to: optional (width, height) applied per frame (the HF-regime
    datasets cv2-resize to 224x224 on the host, dataset.py:349-352).
    """
    _require_cv2()
    indices = [int(i) for i in indices]
    if not indices:
        raise ValueError("decode_frames requires at least one index")
    order = np.argsort(np.asarray(indices), kind="stable")
    sorted_unique = sorted(set(indices))

    cap = cv2.VideoCapture(str(path))
    if not cap.isOpened():
        raise ValueError(f"Could not open video: {path}")

    decoded = {}
    pos = 0
    shape_hw: Optional[Tuple[int, int]] = None
    for target in sorted_unique:
        ok = True
        # Skip undecoded frames cheaply.
        while pos < target:
            if not cap.grab():
                ok = False
                break
            pos += 1
        frame = None
        if ok:
            ret, frame = cap.read()
            if ret:
                pos += 1
            else:
                frame = None
        if frame is None:
            # Retry with a hard seek (reference fallback ladder).
            cap.set(cv2.CAP_PROP_POS_FRAMES, target)
            ret, frame = cap.read()
            if ret:
                pos = target + 1
            else:
                frame = None
                pos = target + 1  # resume skipping from here
        if frame is not None:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            if resize_to is not None:
                frame = cv2.resize(frame, resize_to)
            shape_hw = frame.shape[:2]
        decoded[target] = frame
    cap.release()

    if shape_hw is None:
        if resize_to is not None:
            shape_hw = (resize_to[1], resize_to[0])
        else:
            raise ValueError(f"Could not decode any frame of {path}")

    placeholder = np.full((*shape_hw, 3), 127, dtype=np.uint8)
    out = np.stack([
        decoded[i] if decoded.get(i) is not None else placeholder for i in indices
    ])
    return out


def write_video(path, frames_rgb: np.ndarray, fps: float = 30.0,
                codec: str = "auto") -> str:
    """Encode RGB uint8 (T,H,W,C) to a video file.

    ``codec="auto"`` (default) runs a cv2 fallback chain with mp4v first:
    the reference tries avc1 -> mp4v -> H264 -> XVID
    (src/yolo_detector.py:546-569) but cv2's avc1/H264 encoders are absent
    in this image, and mp4v also *decodes* ~2x faster than h264 on this
    host (measured 30.8 vs 58.4 ms for a 32-of-96-frame 224p clip), which
    matters for every downstream epoch. ``codec="h264"`` (or "avc1")
    requests the reference's preferred codec through the native libx264
    encoder (data/native.py::encode_h264) — cv2 cannot produce it here."""
    _require_cv2()
    path = str(path)
    t, h, w, _ = frames_rgb.shape
    if codec in ("h264", "avc1", "H264"):
        from . import native as _native

        _native.encode_h264(path, frames_rgb, fps=fps)
        return "h264"
    for codec in ("mp4v", "avc1", "XVID"):
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*codec), fps, (w, h))
        if writer.isOpened():
            for f in frames_rgb:
                writer.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
            writer.release()
            return codec
        writer.release()
    raise RuntimeError(f"No working video codec found for {path}")
