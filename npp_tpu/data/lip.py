"""LIP dataset: joint pose + parsing samples.

Host-side re-implementation of reference ``dataset/data_loader.py:33-307``
(LIPDataset). Heavy per-pixel target rendering is NOT done here — the
loader returns geometry (augmented image, warped parsing labels, joint
coords, visibility) and the batcher renders Gaussian heatmaps and edge maps
on-device (npp_tpu.data.targets), replacing the reference's Python pixel
loops in DataLoader workers.
"""
from __future__ import annotations

import json
import os

import cv2
import numpy as np

from npp_tpu.data import augmentation as aug
from npp_tpu.data import targets as tgt

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# LIP parsing left/right class pairs (right, left) for flip swapping
# (target_generation.py:50-51).
LIP_FLIP_PAIRS = ((15, 14), (17, 16), (19, 18))


def normalize_image(im_uint8_rgb: np.ndarray) -> np.ndarray:
    x = im_uint8_rgb.astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


class LIPDataset:
    """Sample dict interface:
    image (H,W,3) f32 normalized | par (H,W) uint8 | joints (16,2) f32 |
    visibility (16,) f32 | scale f32 | crop_param (1,8) f32 | name str.
    """

    num_joints = 16
    flip_pairs = LIP_FLIP_PAIRS

    def __init__(self, root, im_root, pose_anno_file, parsing_anno_root, *,
                 crop_size=(384, 384), sigma=3, pose_net_stride=4,
                 scale_min=0.7, scale_max=1.3, max_rotate_degree=40,
                 max_center_trans=40, flip_prob=0.5, is_train=True,
                 sample=-1, inv_order=False, seed=None):
        self.root = root
        self.im_root = os.path.join(root, im_root)
        self.parsing_anno_root = os.path.join(root, parsing_anno_root)
        with open(os.path.join(root, pose_anno_file)) as f:
            self.anno_list = json.load(f)["root"]
        if sample != -1:
            self.anno_list = (self.anno_list[:sample] if not inv_order
                              else self.anno_list[-sample:])
        self.crop_size = crop_size
        self.sigma = sigma
        self.pose_net_stride = pose_net_stride
        self.scale_min = scale_min
        self.scale_max = scale_max
        self.max_rotate_degree = max_rotate_degree
        self.max_center_trans = max_center_trans
        self.flip_prob = flip_prob
        self.is_train = is_train
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.anno_list)

    def image_names(self):
        return [item["im_name"] for item in self.anno_list]

    def __getitem__(self, index):
        item = self.anno_list[index]
        im_name = item["im_name"]
        im = cv2.imread(os.path.join(self.im_root, im_name), 1)
        im = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        name_prefix = im_name.split(".")[0]
        parsing_anno = cv2.imread(
            os.path.join(self.parsing_anno_root, name_prefix + ".png"), 0)

        joints_all = np.array(item["joint_self"])
        joints = aug.transform_mpi_to_ours(joints_all[:, 0:2])
        visibility = np.sum(joints, axis=1) != 0
        center = np.array([item["objpos"]], np.float64)

        return self._build_sample(im, parsing_anno, joints, visibility,
                                  center, name_prefix, self.flip_pairs)

    def _build_sample(self, im, parsing_anno, joints, visibility, center,
                      name, flip_pairs,
                      flip_right=aug.RIGHT_IDX, flip_left=aug.LEFT_IDX):
        cw, ch = self.crop_size
        rng = self.rng
        if self.is_train:
            im_s, scale = aug.augmentation_scale(
                im, 1.0, scale_min=self.scale_min, scale_max=self.scale_max,
                is_train=True, crop_size=float(cw), rng=rng)
            joints, center = aug.scale_coords(joints, center, scale)
            im_r, rot = aug.augmentation_rotate(
                im_s, max_rotate_degree=self.max_rotate_degree, rng=rng)
            joints, center = aug.rotate_coords(joints, center, rot)
            im_c, crop_param = aug.augmentation_cropped(
                im_r, center, crop_x=cw, crop_y=ch,
                max_center_trans=self.max_center_trans, rng=rng)
            joints, center = aug.crop_coords(joints, center, crop_param)
            im_f, flip = aug.augmentation_flip(im_c, flip_prob=self.flip_prob,
                                               rng=rng)
            joints, center = aug.flip_coords(joints, center, flip,
                                             im_f.shape[1], flip_right,
                                             flip_left)
            if flip:
                visibility = visibility.copy()
                for r, l in zip(flip_right, flip_left):
                    visibility[r], visibility[l] = (visibility[l],
                                                    visibility[r])
            par = tgt.gen_parsing_target(
                parsing_anno, scale_param=scale,
                rotate_param=[rot, im_r.shape[1], im_r.shape[0]],
                crop_param=[crop_param, im_c.shape[1], im_c.shape[0]],
                flip_param=flip, stride=1, flip_pairs=flip_pairs)
            image = im_f
        else:
            im_s, scale = aug.augmentation_scale(
                im, 1.0, is_train=False, crop_size=float(cw), rng=rng)
            joints, center = aug.scale_coords(joints, center, scale)
            im_c, crop_param = aug.augmentation_cropped(
                im_s, center, crop_x=cw, crop_y=ch, max_center_trans=0,
                rng=rng)
            joints, center = aug.crop_coords(joints, center, crop_param)
            par = tgt.gen_parsing_target(
                parsing_anno, scale_param=scale,
                crop_param=[crop_param, im_c.shape[1], im_c.shape[0]],
                stride=1, flip_pairs=flip_pairs)
            image = im_c

        return {
            "image": normalize_image(np.ascontiguousarray(
                image.astype(np.uint8))),
            "par": par.astype(np.uint8),
            "joints": joints.astype(np.float32),
            "visibility": visibility.astype(np.float32),
            "scale": np.float32(scale),
            "crop_param": crop_param.astype(np.float32),  # (1, 8)
            "name": name,
        }
