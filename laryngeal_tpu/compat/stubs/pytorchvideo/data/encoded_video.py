"""Stub EncodedVideo: importable, unusable — by design.

The reference wraps every ``EncodedVideo.from_path`` call in try/except and
falls back to cv2 decoding (``vivit_transformer/.../data_config/
dataset.py:203-296``), so raising here exercises the reference's own
fallback path with zero behavioral invention on our side.
"""


class EncodedVideo:
    @classmethod
    def from_path(cls, *args, **kwargs):
        raise RuntimeError(
            "pytorchvideo stub: no native decoder available; "
            "falling back to the caller's cv2 path")

    def __init__(self, *args, **kwargs):
        raise RuntimeError("pytorchvideo stub: EncodedVideo is not usable")
