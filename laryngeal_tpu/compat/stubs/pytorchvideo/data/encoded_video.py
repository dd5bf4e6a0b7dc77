"""Stub EncodedVideo.

Default: importable, unusable — by design. The HF-family reference datasets
wrap every ``EncodedVideo.from_path`` call in try/except and fall back to
cv2 decoding (``vivit_transformer/.../data_config/dataset.py:203-296``), so
raising here exercises the reference's own fallback path with zero
behavioral invention on our side.

``LARYNGEAL_STUB_DECODE=1``: a REAL cv2-backed implementation of the
pytorchvideo contract — needed for the CNN-family reference pipelines
(``resnet50-3d-video/.../dataset.py:213-231``), which have NO cv2 fallback
of their own: ``duration`` in seconds and ``get_clip(start_sec, end_sec)``
returning ``{"video": float32 (C, T, H, W) tensor in 0-255, "audio": None}``
with the frames whose presentation time lies in [start_sec, end_sec]
(inclusive end, matching pytorchvideo's pts <= end selection).
"""

import os


class EncodedVideo:
    @classmethod
    def from_path(cls, path, *args, **kwargs):
        if os.environ.get("LARYNGEAL_STUB_DECODE") == "1":
            return _Cv2EncodedVideo(path)
        raise RuntimeError(
            "pytorchvideo stub: no native decoder available; "
            "falling back to the caller's cv2 path")

    def __init__(self, *args, **kwargs):
        raise RuntimeError("pytorchvideo stub: EncodedVideo is not usable")


class _Cv2EncodedVideo:
    def __init__(self, path):
        import cv2

        self._path = str(path)
        cap = cv2.VideoCapture(self._path)
        if not cap.isOpened():
            raise RuntimeError(f"cv2 could not open {path}")
        self._fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        self._total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()

    @property
    def duration(self):
        return self._total / self._fps if self._fps else None

    def get_clip(self, start_sec, end_sec):
        import cv2
        import numpy as np
        import torch

        import math

        # Frame i has pts i/fps; pytorchvideo keeps start <= pts <= end.
        # The 1e-4 slack absorbs float noise in (i/fps)*fps round trips.
        first = max(0, math.ceil(start_sec * self._fps - 1e-4))
        last = min(self._total - 1, math.floor(end_sec * self._fps + 1e-4))
        cap = cv2.VideoCapture(self._path)
        frames = []
        idx = 0
        while idx <= last:
            ok, frame = cap.read()
            if not ok:
                break
            if idx >= first:
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            idx += 1
        cap.release()
        if not frames:
            raise RuntimeError(
                f"no frames in [{start_sec}, {end_sec}] of {self._path}")
        video = torch.from_numpy(
            np.stack(frames).astype("float32"))     # (T, H, W, C)
        return {"video": video.permute(3, 0, 1, 2), "audio": None}
