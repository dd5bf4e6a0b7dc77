"""HF-datasets preprocessing path (the reference's notebook-era pipeline).

Parity surface:
- ``data_handling.py:12-38`` ``read_video_pyav`` -> :func:`read_video_clip`
  (cv2-backed; av is absent in this image), ``:41-56``
  ``sample_frame_indices`` (rate-based random clip), ``:59-113`` directory
  walker building ``{video, labels, split, path}`` dicts;
- ``data_preprocessing.py:9-60`` / ``data_preprocessing_timesformer.py``:
  ``Dataset.from_list`` -> ``class_encode_column`` -> processor map ->
  shuffle(seed 42) -> ``train_test_split(0.1)``;
- ``model_configuration.py:11-31,51-66`` ``collate_fn`` and
  ``compute_metrics`` equivalents (accuracy via evals.metrics — the
  ``evaluate`` package is absent).

Gated on the ``datasets`` package (installed in this image).
"""

from __future__ import annotations

import random
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ..evals.metrics import accuracy_score
from ..preprocess.transforms import HF_PIXEL_FNS
from .video import decode_frames, get_video_properties


def sample_frame_indices(clip_len: int, frame_sample_rate: int,
                         seg_len: int, rng: Optional[random.Random] = None) -> np.ndarray:
    """Rate-based random clip sampling (data_handling.py:41-56):
    pick a random end index, take clip_len indices spaced by sample rate.

    Deviation from the reference: for videos shorter than
    ``clip_len * frame_sample_rate`` the reference produces negative start
    indices (silently decoding the wrong frames); we clamp to [0, seg_len-1].
    """
    rng = rng or random
    converted_len = int(clip_len * frame_sample_rate)
    if seg_len <= converted_len:
        end_idx = seg_len
    else:
        end_idx = rng.randint(converted_len, seg_len)
    start_idx = max(end_idx - converted_len, 0)
    indices = np.linspace(start_idx, end_idx, num=clip_len)
    return np.clip(indices, 0, seg_len - 1).astype(np.int64)


def read_video_clip(video_path, indices, resize_to=(224, 224)) -> np.ndarray:
    """Decode selected indices as RGB uint8 (T,H,W,C) (data_handling.py:12-38
    read_video_pyav equivalent; cv2-backed)."""
    return decode_frames(video_path, list(indices), resize_to=resize_to)


def frames_convert_and_create_dataset_dictionary(
    root_dir, clip_len: int = 32, frame_sample_rate: int = 1,
    seed: int = 42,
) -> List[Dict]:
    """Walk ``{root}/{split}/{class}/*.mp4`` into example dicts
    (data_handling.py:59-113)."""
    rng = random.Random(seed)
    out = []
    root = Path(root_dir)
    for split_dir in sorted(d for d in root.iterdir() if d.is_dir()):
        for class_dir in sorted(d for d in split_dir.iterdir() if d.is_dir()):
            for vp in sorted(class_dir.glob("*.mp4")):
                total = get_video_properties(vp)[0]
                idx = sample_frame_indices(clip_len, frame_sample_rate, total, rng)
                out.append({
                    "video": read_video_clip(vp, idx),
                    "labels": class_dir.name,
                    "split": split_dir.name,
                    "path": str(vp),
                })
    return out


def create_dataset(examples: List[Dict], model_type: str = "vivit",
                   test_size: float = 0.1, seed: int = 42):
    """HF Dataset build (data_preprocessing.py:34-60): encode class labels,
    apply the model's pixel transform, shuffle, split."""
    from datasets import Dataset

    pixel_fn = HF_PIXEL_FNS[model_type]

    def process_example(example):
        video = np.asarray(example["video"], dtype=np.uint8)
        example["pixel_values"] = np.asarray(pixel_fn(video))
        return example

    ds = Dataset.from_list([
        {"video": e["video"], "labels": e["labels"]} for e in examples
    ])
    ds = ds.class_encode_column("labels")
    ds = ds.map(process_example, remove_columns=["video"])
    ds = ds.shuffle(seed=seed)
    return ds.train_test_split(test_size=test_size)


def collate_fn(examples) -> Dict[str, np.ndarray]:
    """Stack pixel_values/labels (model_configuration.py:11-31)."""
    pixel_values = np.stack([np.asarray(e["pixel_values"]) for e in examples])
    labels = np.asarray([e["labels"] for e in examples], dtype=np.int32)
    return {"pixel_values": pixel_values, "labels": labels}


def compute_metrics(eval_pred) -> Dict[str, float]:
    """Accuracy from (logits, labels) (model_configuration.py:8-9)."""
    logits, labels = eval_pred
    preds = np.asarray(logits).argmax(axis=-1)
    return {"accuracy": accuracy_score(labels, preds)}


def initialise_model(num_frames: int = 32, num_classes: int = 2,
                     model_type: str = "vivit"):
    """Config-override model init (model_configuration.py:34-66): our Flax
    equivalents of Vivit/TimesformerForVideoClassification with id2label."""
    from ..models.registry import create_model

    model = create_model(model_type, num_classes=num_classes,
                         num_frames=num_frames, image_size=224)
    id2label = {0: "non_referral", 1: "referral"}
    label2id = {v: k for k, v in id2label.items()}
    return model, id2label, label2id
