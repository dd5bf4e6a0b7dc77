"""Dataset organization operations — the reference's root-level scripts as a
library (each has a thin CLI in ``scripts/``).

Parity surface (SURVEY.md §2.1):
- stratified 70/15/15 splitter with per-split stats
  (``scripts/video_data_distribution.py:11-67``);
- CSV-driven organizer building ``organized_dataset/{split}/{class}``
  (``scripts/organize_dataset.py:6-76``);
- W&B table-JSON -> CSV extractor with Grade 1 -> 0 / Grades 2-3 -> 1 mapping
  (``scripts/distribute_video_data_enhanceai.py:7-45``);
- flat referral/non_referral organizer (``scripts/referral_videos_split.py``);
- recursive file/folder counter (``scripts/file_counting.py:4-45``).
"""

from __future__ import annotations

import csv
import json
import random
import shutil
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple


def stratified_split(
    items: Sequence,
    labels: Sequence,
    fractions: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
) -> Dict[str, List]:
    """Label-stratified train/val/test split (sklearn-free)."""
    if abs(sum(fractions) - 1.0) > 1e-6:
        raise ValueError("fractions must sum to 1")
    rng = random.Random(seed)
    by_label: Dict = {}
    for it, lb in zip(items, labels):
        by_label.setdefault(lb, []).append(it)
    out = {"train": [], "val": [], "test": []}
    for lb, group in sorted(by_label.items(), key=lambda kv: str(kv[0])):
        group = sorted(group)
        rng.shuffle(group)
        n = len(group)
        n_train = int(round(n * fractions[0]))
        n_val = int(round(n * fractions[1]))
        out["train"] += group[:n_train]
        out["val"] += group[n_train : n_train + n_val]
        out["test"] += group[n_train + n_val :]
    return out


def create_balanced_splits(
    source_dir,
    output_dir,
    fractions: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
    copy: bool = True,
) -> Dict[str, Dict[str, int]]:
    """``{source}/{class}/*.mp4`` -> ``{output}/{split}/{class}/`` with
    stratification by class; returns per-split class counts."""
    source_dir, output_dir = Path(source_dir), Path(output_dir)
    items, labels = [], []
    for class_dir in sorted(d for d in source_dir.iterdir() if d.is_dir()):
        for f in sorted(class_dir.glob("*.mp4")):
            items.append(f)
            labels.append(class_dir.name)
    splits = stratified_split(items, labels, fractions, seed)
    stats: Dict[str, Dict[str, int]] = {}
    for split, files in splits.items():
        counter: Counter = Counter()
        for f in files:
            cls = f.parent.name
            dest = output_dir / split / cls
            dest.mkdir(parents=True, exist_ok=True)
            if copy:
                shutil.copy2(f, dest / f.name)
            counter[cls] += 1
        stats[split] = dict(counter)
    with open(output_dir / "split_statistics.json", "w") as fh:
        json.dump(stats, fh, indent=4)
    return stats


def organize_from_csv(
    csv_dir,
    video_source_dir,
    output_dir,
    splits: Sequence[str] = ("train", "val", "test"),
    filename_column: str = "File Name",
    label_column: str = "Label",
    class_names: Tuple[str, str] = ("non-referral", "referral"),
) -> Dict[str, int]:
    """Build ``{output}/{split}/{class}`` from ``{split}.table_unique.csv``
    files (scripts/organize_dataset.py semantics)."""
    csv_dir, src, out = Path(csv_dir), Path(video_source_dir), Path(output_dir)
    copied: Dict[str, int] = {}
    for split in splits:
        path = csv_dir / f"{split}.table_unique.csv"
        if not path.exists():
            continue
        n = 0
        with open(path) as fh:
            for row in csv.DictReader(fh):
                name = row[filename_column]
                label = int(float(row[label_column]))
                cls = class_names[1] if label == 1 else class_names[0]
                dest = out / split / cls
                dest.mkdir(parents=True, exist_ok=True)
                candidates = list(src.rglob(name)) or list(src.rglob(f"{name}*"))
                if candidates:
                    shutil.copy2(candidates[0], dest / candidates[0].name)
                    n += 1
        copied[split] = n
    return copied


def grade_to_binary_label(grade) -> int:
    """Grade 1 -> 0 (non-referral), Grades 2-3 -> 1 (referral)
    (scripts/distribute_video_data_enhanceai.py:33-35)."""
    return 0 if int(grade) <= 1 else 1


def wandb_table_to_csv(table_json_path, out_csv_path,
                       filename_key: str = "File Name",
                       grade_key: str = "Grade") -> int:
    """Parse a W&B table JSON ({columns, data}) into a deduped CSV with
    binary labels."""
    with open(table_json_path) as fh:
        table = json.load(fh)
    cols = table["columns"]
    fn_i = cols.index(filename_key)
    gr_i = cols.index(grade_key)
    seen = set()
    rows = []
    for row in table["data"]:
        name = row[fn_i]
        if name in seen:
            continue
        seen.add(name)
        rows.append((name, int(row[gr_i]), grade_to_binary_label(row[gr_i])))
    with open(out_csv_path, "w", newline="") as fh:
        wr = csv.writer(fh)
        wr.writerow([filename_key, grade_key, "Label"])
        wr.writerows(rows)
    return len(rows)


def flat_class_split(csv_path, video_source_dir, output_dir,
                     filename_column: str = "File Name",
                     label_column: str = "Label") -> Dict[str, int]:
    """CSV -> ``{output}/{referral,non_referral}`` flat copy
    (scripts/referral_videos_split.py:5-54)."""
    out = Path(output_dir)
    src = Path(video_source_dir)
    counts = {"referral": 0, "non_referral": 0}
    with open(csv_path) as fh:
        for row in csv.DictReader(fh):
            cls = "referral" if int(float(row[label_column])) == 1 else "non_referral"
            dest = out / cls
            dest.mkdir(parents=True, exist_ok=True)
            candidates = list(src.rglob(row[filename_column]))
            if candidates:
                shutil.copy2(candidates[0], dest / candidates[0].name)
                counts[cls] += 1
    return counts


def count_files(directory, recursive: bool = True) -> Dict[str, int]:
    """File/folder counts (scripts/file_counting.py:4-45)."""
    directory = Path(directory)
    files = folders = 0
    it = directory.rglob("*") if recursive else directory.iterdir()
    for p in it:
        if p.is_file():
            files += 1
        elif p.is_dir():
            folders += 1
    return {"files": files, "folders": folders}
