"""Pointers to the reference repo's vendored data assets.

The reference ships two kinds of data files the training/eval protocol
depends on (SURVEY.md §1 'Data assets'):

- **LIP split lists** (`dataset/lip_listtxt/`): `train_set.txt` /
  `mini_set.txt` (search bi-level splits, 15,231 lines),
  `valList.txt` (10,000 val pairs), `sample_set.txt`, `testvalList.txt`.
  Each line is whitespace-separated relative paths
  (image, parsing PNG[, reversed PNG, edge PNG]).
- **LIP pose ground truth** (`prepare_files/pose_csv/pose_gt.csv`): 16
  joints per row as `x,y,vis` triples in LIP CSV joint order — the file
  `utils/calc_pckh.py:99-126` evaluates PCKh@0.5 against.

This repo does not vendor copies; it reads them in place from the
reference mount (override with ``NPP_REFERENCE_ROOT``). The PCKh CSV
protocol is golden-tested against the real GT file in
tests/test_reference_parity.py.
"""
from __future__ import annotations

import os

REFERENCE_ROOT = os.environ.get("NPP_REFERENCE_ROOT", "/root/reference")

SPLIT_FILES = {
    "train": "train_set.txt",
    "mini": "mini_set.txt",
    "val": "valList.txt",
    "sample": "sample_set.txt",
    "testval": "testvalList.txt",
}


def lip_split_path(split: str) -> str:
    """Path of a LIP split list (reference dataset/lip_listtxt/)."""
    return os.path.join(REFERENCE_ROOT, "dataset", "lip_listtxt",
                        SPLIT_FILES.get(split, split))


def lip_pose_gt_csv() -> str:
    """Path of the LIP 16-joint PCKh ground-truth CSV."""
    return os.path.join(REFERENCE_ROOT, "prepare_files", "pose_csv",
                        "pose_gt.csv")


def load_split(split: str) -> list[list[str]]:
    """Parse a split list into per-sample relative-path tuples."""
    path = lip_split_path(split)
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts:
                out.append(parts)
    return out


def assets_available() -> bool:
    return os.path.isfile(lip_pose_gt_csv())


def resolve_pose_gt_csv(configured: str = "") -> str | None:
    """The PCKh GT CSV to evaluate against: an explicitly configured path
    (cfg.pose_gt_path, the reference's YAML POSE_GT_PATH) if it exists,
    else the reference mount's vendored file, else None (PCKh skipped)."""
    if configured and os.path.isfile(configured):
        return configured
    path = lip_pose_gt_csv()
    return path if os.path.isfile(path) else None
