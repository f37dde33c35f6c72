"""Pascal-Person-Part dataset: per-person boxes with Hungarian-matched
instance masks.

Host-side re-implementation of reference ``dataset/pascal.py:62-357``
(PPPDataset): pose ``.mat`` annotations provide per-person boxes+joints;
Mask-R-CNN instance predictions (``.npy``) are matched to GT boxes by IoU
cost via ``linear_sum_assignment`` (pascal.py:125-168); the matched mask
gates the parsing annotation, the person box is cropped, and the same
scale/rotate/crop/flip chain as LIP runs (without left/right class
swapping — PPP classes are side-agnostic, target_generation.py:83-87).

14 joints: 0 forehead, 1 neck, 2-7 left (sho/elb/wri/hip/knee/ank),
8-13 right.
"""
from __future__ import annotations

import os

import cv2
import numpy as np
import scipy.io as scio
from scipy.optimize import linear_sum_assignment

from npp_tpu.data.lip import LIPDataset

# PPP left/right joint index sets (pascal.py:257-258). NOTE: in PPP order
# "right_idx" = indices 2-7 (left side per the comment) — we mirror the
# reference's pairing exactly.
PPP_RIGHT_IDX = (2, 3, 4, 5, 6, 7)
PPP_LEFT_IDX = (8, 9, 10, 11, 12, 13)


def box_iou(a, b) -> float:
    """IoU of [x1,y1,x2,y2] boxes (pascal.py:36-60)."""
    carea = (a[2] - a[0]) * (a[3] - a[1])
    garea = (b[2] - b[0]) * (b[3] - b[1])
    w = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    h = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = w * h
    return inter / (carea + garea - inter)


def build_ppp_db(im_list, pose_anno_path, mask_path,
                 iou_cost_threshold: float = 0.3):
    """Offline db construction (pascal.py:125-168): Hungarian-match GT
    person boxes to predicted instance masks; keep pairs with IoU cost
    <= threshold."""
    db = []
    for im_name in im_list:
        pose_file = os.path.join(pose_anno_path, im_name + ".mat")
        if not os.path.isfile(pose_file):
            continue
        mask_dict = np.load(os.path.join(mask_path, im_name + ".npy"),
                            allow_pickle=True).item()
        person = np.where(mask_dict["pred_classes"] == 0)
        prior_boxes = mask_dict["boxes"][person]
        prior_masks = mask_dict["pred_masks"][person]

        pose_labels = scio.loadmat(pose_file)
        boxes = pose_labels["boxes"]
        joints = pose_labels["joints"]
        assert boxes.shape[1] == joints.shape[1]
        cost = np.zeros((boxes.shape[1], prior_masks.shape[0]))
        for m in range(boxes.shape[1]):
            for n in range(prior_masks.shape[0]):
                cost[m, n] = 1 - box_iou(boxes[0, m][0].astype(np.float32),
                                         prior_boxes[n])
        gt_idx, prior_idx = linear_sum_assignment(cost)
        for g, p in zip(gt_idx, prior_idx):
            if cost[g, p] > iou_cost_threshold:
                continue
            db.append({
                "im_name": im_name,
                "box": boxes[0, g],
                "joint": joints[0, g],
                "mask": prior_masks[p],
            })
    return db


class PPPDataset(LIPDataset):
    """Shares the augmentation/sample machinery with LIPDataset but loads
    per-person crops from PPP annotations."""

    num_joints = 14
    flip_pairs = ()  # PPP has no left/right parsing classes

    def __init__(self, root, im_root, im_list_path, pose_anno_path,
                 parsing_anno_path, mask_path, *, crop_size=(384, 384),
                 sigma=3, pose_net_stride=4, scale_min=0.5, scale_max=1.25,
                 max_rotate_degree=40, max_center_trans=40, flip_prob=0.5,
                 is_train=True, sample=-1, inv_order=False, seed=None,
                 device_normalize=False):
        self.root = root
        self.im_root = os.path.join(root, im_root)
        self.parsing_anno_path = os.path.join(root, parsing_anno_path)
        with open(os.path.join(root, im_list_path)) as f:
            im_list = [line.strip() for line in f]
        self.db = build_ppp_db(im_list, os.path.join(root, pose_anno_path),
                               os.path.join(root, mask_path))
        if sample != -1:
            self.db = self.db[:sample] if not inv_order else self.db[-sample:]
        self.crop_size = crop_size
        self.sigma = sigma
        self.pose_net_stride = pose_net_stride
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.max_rotate_degree = max_rotate_degree
        self.max_center_trans = max_center_trans
        self.flip_prob = flip_prob
        self.is_train = is_train
        self.device_normalize = device_normalize
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.db)

    def image_names(self):
        return [d["im_name"] for d in self.db]

    def __getitem__(self, index):
        item = self.db[index]
        box = item["box"].astype(np.int32)
        im = cv2.imread(os.path.join(self.im_root, item["im_name"] + ".jpg"),
                        1)
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        crop = im[box[0, 1]:box[0, 3], box[0, 0]:box[0, 2], :].copy()

        parsing = cv2.imread(os.path.join(self.parsing_anno_path,
                                          item["im_name"] + ".png"), 0)
        parsing = parsing * item["mask"]
        parsing = parsing[box[0, 1]:box[0, 3], box[0, 0]:box[0, 2]].copy()

        joints_all = np.array(item["joint"])
        joints = np.zeros((joints_all.shape[0], 2))
        joints[:, 0] = joints_all[:, 0] - box[0, 0]
        joints[:, 1] = joints_all[:, 1] - box[0, 1]
        visibility = joints_all[:, 2] != 0
        center = np.array([[(box[0, 2] - box[0, 0]) / 2,
                            (box[0, 3] - box[0, 1]) / 2]])

        return self._build_sample(crop, parsing, joints, visibility, center,
                                  item["im_name"], self.flip_pairs,
                                  flip_right=PPP_RIGHT_IDX,
                                  flip_left=PPP_LEFT_IDX)
