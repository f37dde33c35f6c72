"""Offline OKS-mAP driver for Pascal-Person-Part pose.

Equivalent of reference ``core/mAP.py`` ``__main__`` (:78-110): loads
per-image person predictions (npy dict: im_name -> list of (J,2) arrays),
matches against GT ``.mat`` joints/boxes, and reports AP over OKS
thresholds 0.5:0.05:0.95.

Usage:
  python tools/eval_ppp_map.py --val-list data/pascal_data/val_id.txt \
      --gt-dir data/pascal_data/PersonJoints --preds pose_pred.npy
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import scipy.io as scio


def load_gt(gt_dir: str, im_names):
    gts = {}
    for name in im_names:
        path = os.path.join(gt_dir, name + ".mat")
        if not os.path.isfile(path):
            continue
        m = scio.loadmat(path)
        joints = [m["joints"][0, i] for i in range(m["joints"].shape[1])]
        boxes = [m["boxes"][0, i] for i in range(m["boxes"].shape[1])]
        gts[name] = (joints, boxes)
    return gts


def main():
    from npp_tpu.utils.metrics import oks_map

    p = argparse.ArgumentParser()
    p.add_argument("--val-list", required=True)
    p.add_argument("--gt-dir", required=True)
    p.add_argument("--preds", required=True,
                   help=".npy dict im_name -> list of (J,2) predictions")
    args = p.parse_args()

    with open(args.val_list) as f:
        im_names = [line.strip() for line in f]
    preds = np.load(args.preds, allow_pickle=True).item()
    gts = load_gt(args.gt_dir, im_names)
    ap = oks_map(preds, gts)
    joints = ["fore", "neck", "Lsho", "Lelb", "Lwri", "Lhip", "Lkne",
              "Lank", "Rsho", "Relb", "Rwri", "Rhip", "Rkne", "Rank"]
    for name, v in zip(joints, ap[:-1]):
        print(f"{name:6s}: {v:.4f}")
    print(f"mAP (OKS 0.5:0.05:0.95): {ap[-1]:.4f}")


if __name__ == "__main__":
    main()
