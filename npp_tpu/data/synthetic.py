"""Synthetic joint pose+parsing dataset.

Fills the role the reference has nothing for (SURVEY.md §4: no tests, no
fixtures): deterministic, LIP-shaped random samples — blob people with
consistent parsing masks, joint locations, and crop params — so the full
train/eval path runs without the LIP/PPP archives.
"""
from __future__ import annotations

import numpy as np

from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD


class SyntheticDataset:
    """Same sample dict interface as LIPDataset."""

    def __init__(self, *, length=64, crop_size=(384, 384), num_joints=16,
                 num_classes=20, seed=0, is_train=True,
                 device_normalize=False):
        self.length = length
        self.crop_size = crop_size
        self.num_joints = num_joints
        self.num_classes = num_classes
        self.seed = seed
        self.is_train = is_train
        self.flip_pairs = ()
        # Ship raw uint8 images; the loader's renderer (built with
        # normalize_images=True) normalizes on device.
        self.device_normalize = device_normalize

    def __len__(self):
        return self.length

    def image_names(self):
        return [f"synthetic_{i:06d}.jpg" for i in range(self.length)]

    def __getitem__(self, index):
        rng = np.random.default_rng(self.seed * 100003 + index)
        cw, ch = self.crop_size
        image = rng.integers(0, 255, (ch, cw, 3)).astype(np.uint8)
        par = np.zeros((ch, cw), np.uint8)
        # A few rectangular "body parts" with distinct classes.
        joints = np.zeros((self.num_joints, 2), np.float32)
        margin = max(4, min(cw, ch) // 8)
        for j in range(self.num_joints):
            cx = rng.integers(margin, cw - margin)
            cy = rng.integers(margin, ch - margin)
            cls = 1 + (j % (self.num_classes - 1))
            half = int(rng.integers(2, max(3, margin)))
            par[max(cy - half, 0):cy + half, max(cx - half, 0):cx + half] = cls
            image[max(cy - half, 0):cy + half,
                  max(cx - half, 0):cx + half] = (cls * 12) % 255
            joints[j] = (cx, cy)
        vis = (rng.random(self.num_joints) > 0.1).astype(np.float32)
        if self.device_normalize:
            img = image
        else:
            img = (image.astype(np.float32) / 255.0
                   - IMAGENET_MEAN) / IMAGENET_STD
        return {
            "image": img,
            "par": par,
            "joints": joints,
            "visibility": vis,
            "scale": np.float32(1.0),
            "crop_param": np.array([[0, 0, 0, 0, cw, ch, cw, ch]],
                                   np.float32),
            "name": f"synthetic_{index:06d}",
        }
