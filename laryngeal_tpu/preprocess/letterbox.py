"""Letterbox resize + inverse box scaling (ultralytics semantics).

Parity with ``utils.augmentations.letterbox`` and ``utils.general.
scale_boxes`` as used by the detector (``src/yolo_detector.py:52-76``):
aspect-preserving resize to fit (h, w), symmetric gray padding (114),
stride-aligned pad ("auto" mode), and the inverse mapping from letterboxed
coordinates back to original-image pixels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # pragma: no cover
    import cv2

    HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    HAS_CV2 = False


def letterbox(
    img: np.ndarray,
    new_shape: Tuple[int, int] = (640, 640),
    color: int = 114,
    auto: bool = True,
    stride: int = 32,
):
    """Returns (padded image, (gain, gain), (pad_w, pad_h))."""
    h, w = img.shape[:2]
    nh, nw = new_shape
    r = min(nh / h, nw / w)
    new_unpad = (int(round(w * r)), int(round(h * r)))
    dw, dh = nw - new_unpad[0], nh - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2
    if (w, h) != new_unpad:
        if HAS_CV2:
            img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
        else:  # numpy nearest fallback
            ys = (np.arange(new_unpad[1]) / r).astype(int).clip(0, h - 1)
            xs = (np.arange(new_unpad[0]) / r).astype(int).clip(0, w - 1)
            img = img[ys][:, xs]
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = np.pad(img, ((top, bottom), (left, right), (0, 0)),
                 constant_values=color)
    return img, (r, r), (dw, dh)


def scale_boxes(from_shape, boxes: np.ndarray, to_shape) -> np.ndarray:
    """Map xyxy boxes from letterboxed `from_shape` (h, w) back to the
    original `to_shape` (h, w[, c]) image."""
    gain = min(from_shape[0] / to_shape[0], from_shape[1] / to_shape[1])
    pad_w = (from_shape[1] - to_shape[1] * gain) / 2
    pad_h = (from_shape[0] - to_shape[0] * gain) / 2
    boxes = boxes.copy().astype(np.float32)
    boxes[:, [0, 2]] -= pad_w
    boxes[:, [1, 3]] -= pad_h
    boxes[:, :4] /= gain
    boxes[:, [0, 2]] = boxes[:, [0, 2]].clip(0, to_shape[1])
    boxes[:, [1, 3]] = boxes[:, [1, 3]].clip(0, to_shape[0])
    return boxes
