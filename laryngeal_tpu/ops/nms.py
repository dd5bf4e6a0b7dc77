"""Non-maximum suppression + box utilities (host-side numpy).

Matches ultralytics ``non_max_suppression`` semantics for the single-class
case the detector uses (``src/yolo_detector.py:66``): confidence =
objectness * class score, xywh->xyxy, greedy IoU suppression, max_det cap.
Detection counts are tiny (<=1000) so host numpy beats shipping dynamic
shapes to the TPU.
"""

from __future__ import annotations

from typing import List

import numpy as np


def xywh2xyxy(x: np.ndarray) -> np.ndarray:
    y = np.copy(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """IoU matrix between (N,4) and (M,4) xyxy boxes."""
    area_a = (a[:, 2] - a[:, 0]).clip(0) * (a[:, 3] - a[:, 1]).clip(0)
    area_b = (b[:, 2] - b[:, 0]).clip(0) * (b[:, 3] - b[:, 1]).clip(0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clip(0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thres: float) -> np.ndarray:
    """Greedy NMS; returns kept indices sorted by descending score."""
    order = np.argsort(-scores, kind="stable")
    keep: List[int] = []
    while order.size:
        i = order[0]
        keep.append(int(i))
        if order.size == 1:
            break
        ious = box_iou(boxes[i : i + 1], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_thres]
    return np.asarray(keep, dtype=np.int64)


def non_max_suppression(
    prediction: np.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 1000,
) -> List[np.ndarray]:
    """prediction (B, N, 5+nc) decoded xywh+obj+cls -> per-image (n, 6)
    arrays [x1, y1, x2, y2, conf, cls]."""
    prediction = np.asarray(prediction, dtype=np.float32)
    bs, _, no = prediction.shape
    nc = no - 5
    out = []
    for xi in range(bs):
        x = prediction[xi]
        x = x[x[:, 4] > conf_thres]  # objectness gate
        if not x.shape[0]:
            out.append(np.zeros((0, 6), np.float32))
            continue
        # conf = obj * cls
        cls_scores = x[:, 5:] * x[:, 4:5]
        boxes = xywh2xyxy(x[:, :4])
        cls = cls_scores.argmax(axis=1)
        conf = cls_scores[np.arange(len(x)), cls]
        mask = conf > conf_thres
        boxes, conf, cls = boxes[mask], conf[mask], cls[mask]
        if not boxes.shape[0]:
            out.append(np.zeros((0, 6), np.float32))
            continue
        # Class-offset boxes so NMS is per-class (ultralytics trick).
        offset = cls[:, None] * 7680.0
        keep = nms_boxes(boxes + offset, conf, iou_thres)[:max_det]
        det = np.concatenate(
            [boxes[keep], conf[keep, None], cls[keep, None].astype(np.float32)], axis=1
        )
        out.append(det)
    return out
