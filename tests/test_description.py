"""data_description schema loader + splitter wiring
(data_description/data_description.csv:1, dataset_splits.csv:1-7)."""

from pathlib import Path

import pytest

from laryngeal_tpu.data.description import (load_data_description,
                                            load_dataset_splits,
                                            organize_from_description,
                                            parse_grade,
                                            write_dataset_splits)

REPO = Path(__file__).resolve().parent.parent
EXAMPLE = REPO / "data_description" / "data_description.example.csv"
SPLITS = REPO / "data_description" / "dataset_splits.csv"


def test_parse_grade():
    assert parse_grade("Grade 1") == 1
    assert parse_grade("grade 3") == 3
    assert parse_grade("2") == 2
    with pytest.raises(ValueError):
        parse_grade("normal")


def test_load_example_description():
    rows = load_data_description(EXAMPLE)
    assert len(rows) == 6
    by_name = {r["file_name"]: r for r in rows}
    assert by_name["example_0001.mp4"]["label"] == 0
    assert by_name["example_0001.mp4"]["class_name"] == "non_referral"
    assert by_name["example_0003.mp4"]["grade"] == 3
    assert by_name["example_0003.mp4"]["class_name"] == "referral"
    assert by_name["example_0005.mp4"]["flags"]["leukoplakia"] == 1
    assert by_name["example_0004.mp4"]["flags"]["Paediatric"] == 1


def test_bom_header_tolerated(tmp_path):
    p = tmp_path / "d.csv"
    p.write_bytes("﻿File Name,Grade,Label\nv.mp4,Grade 2,1\n".encode())
    rows = load_data_description(p)
    assert rows[0]["file_name"] == "v.mp4" and rows[0]["label"] == 1


def test_label_grade_contradiction_raises(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("File Name,Grade,Label\nv.mp4,Grade 1,1\n")
    with pytest.raises(ValueError, match="contradicts"):
        load_data_description(p)


def test_missing_columns_raise(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("File Name,Grade\nv.mp4,Grade 1\n")
    with pytest.raises(ValueError, match="missing required columns"):
        load_data_description(p)


def test_load_vendored_splits():
    splits = load_dataset_splits(SPLITS)
    assert splits["train"] == {"referral": 61, "non_referral": 31}
    assert splits["val"] == {"referral": 14, "non_referral": 6}
    assert splits["test"] == {"referral": 13, "non_referral": 7}


def test_splits_roundtrip(tmp_path):
    stats = {"train": {"referral": 3, "non_referral": 2},
             "val": {"referral": 1, "non_referral": 1},
             "test": {"referral": 1, "non_referral": 1}}
    p = tmp_path / "s.csv"
    write_dataset_splits(stats, p)
    assert load_dataset_splits(p) == stats


def _make_videos(tmp_path, names):
    src = tmp_path / "raw"
    src.mkdir()
    for n in names:
        (src / n).write_bytes(b"\x00" * 16)
    return src


def test_organize_from_description(tmp_path):
    rows = load_data_description(EXAMPLE)
    src = _make_videos(tmp_path, [r["file_name"] for r in rows])
    out = tmp_path / "organized"
    stats = organize_from_description(EXAMPLE, src, out, seed=42)
    # Every video landed in exactly one split/class dir matching its label.
    total = 0
    for split in ("train", "val", "test"):
        for cls in ("referral", "non_referral"):
            files = list((out / split / cls).glob("*.mp4")) \
                if (out / split / cls).exists() else []
            total += len(files)
            assert stats.get(split, {}).get(cls, 0) == len(files)
    assert total == 6
    # The reference-format splits CSV is written alongside.
    produced = load_dataset_splits(out / "dataset_splits.csv")
    for split in ("train", "val", "test"):
        for cls in ("referral", "non_referral"):
            assert produced[split][cls] == stats.get(split, {}).get(cls, 0)


def test_organize_expected_mismatch_raises(tmp_path):
    rows = load_data_description(EXAMPLE)
    src = _make_videos(tmp_path, [r["file_name"] for r in rows])
    with pytest.raises(ValueError, match="diverge"):
        organize_from_description(EXAMPLE, src, tmp_path / "o", seed=42,
                                  expected_splits_csv=SPLITS, copy=False)


def test_organize_reports_missing(tmp_path):
    src = _make_videos(tmp_path, ["example_0001.mp4"])  # 5 of 6 absent
    stats = organize_from_description(EXAMPLE, src, tmp_path / "o", copy=False)
    assert stats["missing"]["count"] == 5


def test_organize_expected_mismatch_writes_nothing(tmp_path):
    """A count mismatch must fail BEFORE any copy: no partial (or
    complete-but-unverified) tree may be left on disk (regression — the
    copy loop used to run first)."""
    rows = load_data_description(EXAMPLE)
    src = _make_videos(tmp_path, [r["file_name"] for r in rows])
    out = tmp_path / "o_copy"
    with pytest.raises(ValueError, match="diverge"):
        organize_from_description(EXAMPLE, src, out, seed=42,
                                  expected_splits_csv=SPLITS, copy=True)
    assert not out.exists()
