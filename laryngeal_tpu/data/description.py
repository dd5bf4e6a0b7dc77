"""Data-description artifacts — the duhs-gss label-mapping schema as code.

The reference ships two CSVs under ``data_description/``
(``data_description/data_description.csv:1``,
``data_description/dataset_splits.csv:1-7``):

- ``data_description.csv``: one row per labeled video — ``File Name``,
  ``Grade`` ("Grade 1".."Grade 3"), binary ``Label`` (Grade 1 -> 0
  non-referral, Grades 2-3 -> 1 referral), free-text ``Disorder``/
  ``Remarks``, ``Paediatric``, and 14 binary pathology-flag columns.
- ``dataset_splits.csv``: per-split class counts
  (``Split,Category,Count`` — train 61/31, val 14/6, test 13/7).

This module is the loader + validator + splitter wiring so the duhs-gss
workflow is reproducible the day the real dataset appears: parse the
description, check every row's Grade<->Label consistency against the
canonical mapping (``ops.grade_to_binary_label``), organize the raw videos
into ``{split}/{referral,non_referral}`` trees, and verify the result
against the published split counts. A synthetic example of the schema is
checked in at ``data_description/data_description.example.csv``.
"""

from __future__ import annotations

import csv
import re
import shutil
from collections import Counter
from pathlib import Path
from typing import Dict, List, Optional, Tuple

from .ops import grade_to_binary_label, stratified_split

# Required columns, in the reference's order (data_description.csv header).
REQUIRED_COLUMNS = ("File Name", "Grade", "Label")

# The 15 pathology/context flag columns (binary 0/1).
FLAG_COLUMNS = (
    "Paediatric", "vocal_fold_immobile", "glottic_insufficiency", "blood",
    "vocal_granulomas", "subglottic_mass", "arytenoid", "hyoid_bone",
    "secretions", "laryngomalacia", "supraglottic mass", "leukoplakia",
    "supraglottic edema", "paresis", "other abnormalities",
)

CLASS_NAMES = {0: "non_referral", 1: "referral"}

_GRADE_RE = re.compile(r"(?:grade\s*)?(\d+)", re.IGNORECASE)


def parse_grade(grade: str) -> int:
    """'Grade 2' / '2' -> 2."""
    m = _GRADE_RE.search(str(grade))
    if not m:
        raise ValueError(f"unparseable Grade value {grade!r}")
    return int(m.group(1))


def load_data_description(path) -> List[Dict]:
    """Parse + validate a ``data_description.csv``.

    Returns one dict per row with normalized fields: ``file_name``,
    ``grade`` (int), ``label`` (int), ``class_name``, ``flags``
    (dict of the binary flag columns present), plus the raw free-text
    columns. Raises on missing required columns or any row whose Label
    contradicts the Grade mapping (Grade 1 -> 0, Grades 2-3 -> 1).
    """
    rows: List[Dict] = []
    # utf-8-sig: the reference CSV carries a BOM on the first header cell.
    with open(path, newline="", encoding="utf-8-sig") as fh:
        reader = csv.DictReader(fh)
        missing = [c for c in REQUIRED_COLUMNS if c not in (reader.fieldnames or [])]
        if missing:
            raise ValueError(
                f"{path}: missing required columns {missing}; "
                f"got {reader.fieldnames}")
        for i, raw in enumerate(reader, start=2):
            name = (raw.get("File Name") or "").strip()
            if not name:
                continue
            grade = parse_grade(raw["Grade"])
            label = int(float(raw["Label"]))
            expect = grade_to_binary_label(grade)
            if label != expect:
                raise ValueError(
                    f"{path}:{i}: Label {label} contradicts Grade {grade} "
                    f"(canonical mapping: Grade 1 -> 0, Grades 2-3 -> 1)")
            flags = {}
            for c in FLAG_COLUMNS:
                v = (raw.get(c) or "").strip()
                if v:
                    flags[c] = int(float(v))
            rows.append({
                "file_name": name,
                "grade": grade,
                "label": label,
                "class_name": CLASS_NAMES[label],
                "disorder": (raw.get("Disorder") or "").strip(),
                "remarks": (raw.get("Remarks") or "").strip(),
                "flags": flags,
            })
    return rows


def load_dataset_splits(path) -> Dict[str, Dict[str, int]]:
    """Parse a ``dataset_splits.csv`` (Split,Category,Count) into
    ``{split: {category: count}}``."""
    out: Dict[str, Dict[str, int]] = {}
    with open(path, newline="", encoding="utf-8-sig") as fh:
        for row in csv.DictReader(fh):
            out.setdefault(row["Split"].strip(), {})[
                row["Category"].strip()] = int(row["Count"])
    return out


def write_dataset_splits(stats: Dict[str, Dict[str, int]], path) -> None:
    """Write per-split class counts in the reference's CSV format."""
    with open(path, "w", newline="") as fh:
        wr = csv.writer(fh)
        wr.writerow(["Split", "Category", "Count"])
        for split in ("train", "val", "test"):
            for cat in ("referral", "non_referral"):
                wr.writerow([split, cat, stats.get(split, {}).get(cat, 0)])


def organize_from_description(
    description_csv,
    video_source_dir,
    output_dir,
    fractions: Tuple[float, float, float] = (0.7, 0.15, 0.15),
    seed: int = 42,
    expected_splits_csv=None,
    copy: bool = True,
) -> Dict[str, Dict[str, int]]:
    """Description CSV + raw video dir -> ``{output}/{split}/{class}/`` tree.

    Labels come from the description (not directory structure); the split is
    label-stratified (``ops.stratified_split``, same 70/15/15 defaults as
    ``scripts/video_data_distribution.py:11-67``). Writes
    ``dataset_splits.csv`` next to the tree; when ``expected_splits_csv`` is
    given the produced counts are checked against it (before anything is
    written) and a mismatch raises. ``copy=False`` is a true dry run: plan +
    verify with no directories created and no CSV written.
    Videos listed in the CSV but absent on disk are reported, not fatal
    (returns them under the ``"missing"`` key of the stats dict).
    """
    src = Path(video_source_dir)
    out = Path(output_dir)
    rows = load_data_description(description_csv)

    present, missing = [], []
    for r in rows:
        candidates = sorted(src.rglob(r["file_name"]))
        if candidates:
            present.append((candidates[0], r["class_name"]))
        else:
            missing.append(r["file_name"])

    splits = stratified_split([p for p, _ in present],
                              [c for _, c in present], fractions, seed)
    cls_of = dict(present)
    stats: Dict[str, Dict[str, int]] = {
        split: dict(Counter(cls_of[f] for f in files))
        for split, files in splits.items()}

    # Verify BEFORE any copy or sidecar write — the counts are computable
    # from the plan alone, so a mismatch must never leave a partial (or
    # complete-but-wrong) dataset tree on disk; a dry run (copy=False)
    # touches the disk not at all.
    if expected_splits_csv is not None:
        expected = load_dataset_splits(expected_splits_csv)
        diffs = []
        for split, cats in expected.items():
            for cat, n in cats.items():
                got = stats.get(split, {}).get(cat, 0)
                if got != n:
                    diffs.append(f"{split}/{cat}: got {got}, expected {n}")
        if diffs:
            raise ValueError(
                "split counts diverge from expected dataset_splits.csv: "
                + "; ".join(diffs))

    if copy:
        for split, files in splits.items():
            for f in files:
                dest = out / split / cls_of[f]
                dest.mkdir(parents=True, exist_ok=True)
                shutil.copy2(f, dest / f.name)
        write_dataset_splits(stats, out / "dataset_splits.csv")

    if missing:
        stats["missing"] = {"count": len(missing)}
        stats["missing_files"] = missing  # type: ignore[assignment]
    return stats
