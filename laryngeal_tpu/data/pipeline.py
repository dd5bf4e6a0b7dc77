"""Host->device clip pipeline: batching, background prefetch, device feed.

Replaces the reference's ``DataLoader(num_workers, pin_memory)`` +
per-batch ``.to(device)`` (``vivit_transformer/.../data_config/dataloader.py:52-135``)
with a thread-prefetched numpy batcher whose output is dropped straight onto
the device mesh with ``jax.device_put`` + NamedSharding — decode overlaps TPU
compute via a bounded queue (double buffering).

Batches are dense uint8 (B,T,H,W,C) — unlike the reference's HF-variant
collate (a Python list of per-video numpy arrays re-processed by the HF image
processor on host every epoch), preprocessing here is jitted on device
(see preprocess.transforms), so the host only decodes and stacks.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, Optional

import numpy as np

from .dataset import VideoDataset


class ClipLoader:
    """Iterable over stacked clip batches with background prefetch.

    Decode parallelism: item *planning* (frame-index sampling) runs serially
    to preserve the reference's RNG-stream order, then the decodes fan out
    over ``num_workers`` threads (libav/cv2 release the GIL) — the TPU-side
    replacement for the reference's ``DataLoader(num_workers=N)`` worker
    processes (vivit_transformer/.../dataloader.py:88-95).
    """

    def __init__(
        self,
        dataset: VideoDataset,
        batch_size: int = 4,
        shuffle: bool = False,
        seed: int = 42,
        drop_last: bool = False,
        prefetch: int = 2,
        pad_last: bool = False,
        num_workers: Optional[int] = None,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.prefetch = max(1, int(prefetch))
        self.pad_last = pad_last
        if num_workers is None:
            num_workers = min(4, os.cpu_count() or 1)
        self.num_workers = max(1, int(num_workers))
        # Multi-process (multi-host) feed: batch_size stays the GLOBAL batch;
        # every process walks the identical batch plan (same seed/epoch RNG
        # streams — sampler parity is load-bearing, CLAUDE.md), but
        # *decodes* only its contiguous 1/process_count shard of each batch.
        # labels/mask in the emitted dict are the local shard (device feed via
        # parallel.mesh.shard_batch -> make_array_from_process_local_data);
        # labels_global/mask_global carry the full batch for host metrics.
        self.process_index = int(process_index)
        self.process_count = int(process_count)
        if self.process_count > 1:
            if self.batch_size % self.process_count:
                raise ValueError(
                    f"global batch_size {self.batch_size} must divide evenly "
                    f"over {self.process_count} processes")
            if not (pad_last or drop_last):
                raise ValueError(
                    "multi-process feed needs pad_last or drop_last so every "
                    "process sees a full-rank batch")
        self._pool: Optional[ThreadPoolExecutor] = None
        self._epoch = 0

    def _executor(self) -> Optional[ThreadPoolExecutor]:
        if self.num_workers <= 1:
            return None
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers, thread_name_prefix="clip-decode")
        return self._pool

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle epoch (order seed = seed + epoch). The trainer
        calls this with the absolute epoch number so a resumed run shuffles
        identically to the uninterrupted one (a fresh process would otherwise
        restart the implicit per-__iter__ counter at 0)."""
        self._epoch = int(epoch)

    def _order(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(idx)
        return idx

    def _make_batch(self, indices) -> Dict:
        plans = [self.dataset.plan(int(i)) for i in indices]  # serial: RNG order
        n_real = len(plans)
        pad = (self.batch_size - n_real
               if self.pad_last and n_real < self.batch_size else 0)
        # Global batch rows: real items then padding repeating the last row.
        row_plan = list(range(n_real)) + [n_real - 1] * pad
        mask_g = np.concatenate(
            [np.ones(n_real, np.bool_), np.zeros(pad, np.bool_)])
        labels_g = np.asarray(
            [plans[j]["label"] for j in row_plan], dtype=np.int32)
        lo, hi = 0, len(row_plan)
        if self.process_count > 1:
            per = self.batch_size // self.process_count
            lo, hi = self.process_index * per, (self.process_index + 1) * per
        # Decode each needed plan once (padding rows alias the decoded clip;
        # under multi-process only the rows in [lo, hi) are decoded at all).
        needed = sorted({row_plan[r] for r in range(lo, hi)})
        pool = self._executor()
        if pool is not None and len(needed) > 1:
            mats = list(pool.map(self.dataset.materialize,
                                 [plans[j] for j in needed]))
        else:
            mats = [self.dataset.materialize(plans[j]) for j in needed]
        by_plan = dict(zip(needed, mats))
        items = [by_plan[row_plan[r]] for r in range(lo, hi)]
        first = items[0]["pixel_values"]
        if isinstance(first, tuple):
            # Wire-format payload tuple (dct: (dc, ac)) — stack leaf-wise.
            pixel = tuple(
                np.stack([it["pixel_values"][k] for it in items])
                for k in range(len(first)))
        else:
            pixel = np.stack([it["pixel_values"] for it in items])
        out = {
            "pixel_values": pixel,
            "labels": labels_g[lo:hi],
            "mask": mask_g[lo:hi],
            "video_paths": [it["video_path"] for it in items],
            "frame_indices": [it["frame_indices"] for it in items],
        }
        if self.process_count > 1:
            # Full-batch view for host-side metrics (AUROC over all rows);
            # local_rows maps this process's list fields into the global batch.
            out["labels_global"] = labels_g
            out["mask_global"] = mask_g
            out["local_rows"] = (lo, hi)
        return out

    def __iter__(self) -> Iterator[Dict]:
        order = self._order()
        self._epoch += 1
        n = len(order)
        batch_starts = list(range(0, n, self.batch_size))
        if self.drop_last and batch_starts and n - batch_starts[-1] < self.batch_size:
            batch_starts.pop()

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        error_holder = []

        def worker():
            try:
                for s in batch_starts:
                    q.put(self._make_batch(order[s : s + self.batch_size]))
            except Exception as e:  # surfaced on the consumer side
                error_holder.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if error_holder:
            raise error_holder[0]


def create_dataloaders(
    data_dir,
    test_data_dir=None,
    sampling_methods: Optional[Dict[str, str]] = None,
    num_frames: int = 32,
    batch_size: int = 4,
    seed: int = 42,
    label_policy: str = "sorted",
    per_video_seed: bool = False,
    verify_integrity: bool = False,
    resize_to=(224, 224),
    drop_last_train: bool = False,
    pad_last: bool = False,
    cache_clips: bool = True,
    clip_cache_mb: int = 2048,
    cache_dir=None,
    num_workers: Optional[int] = None,
    wire: str = "rgb",
    wire_quality: int = 75,
    wire_keep_ac: int = 31,
    wire_pack_from: int = 14,
    wire_lowres: int = 0,
    process_index: int = 0,
    process_count: int = 1,
) -> Dict[str, ClipLoader]:
    """Train/val/test loaders — the reference ``create_dataloaders`` surface
    (vivit_transformer/.../dataloader.py:52-135) for all five pipelines.
    ``wire`` selects the host->device payload format (see
    preprocess.transforms.decode_wire_batch); steps built with the same wire
    decode it in-graph."""
    sampling_methods = sampling_methods or {}
    loaders = {}
    for split in ("train", "val", "test"):
        root = test_data_dir if (split == "test" and test_data_dir) else data_dir
        ds = VideoDataset(
            root,
            mode=split,
            sampling_method=sampling_methods.get(split, "uniform"),
            num_frames=num_frames,
            label_policy=label_policy,
            per_video_seed=per_video_seed,
            seed=seed,
            verify_integrity=verify_integrity,
            resize_to=resize_to,
            cache_clips=cache_clips,
            clip_cache_mb=clip_cache_mb,
            cache_dir=cache_dir,
            wire=wire,
            wire_quality=wire_quality,
            wire_keep_ac=wire_keep_ac,
            wire_pack_from=wire_pack_from,
            wire_lowres=wire_lowres,
        )
        loaders[split] = ClipLoader(
            ds,
            batch_size=batch_size,
            shuffle=(split == "train"),
            seed=seed,
            drop_last=(split == "train" and drop_last_train),
            pad_last=pad_last or process_count > 1,
            num_workers=num_workers,
            process_index=process_index,
            process_count=process_count,
        )
    return loaders
