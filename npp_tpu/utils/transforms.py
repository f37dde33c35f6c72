"""Keypoint / affine transform utilities.

Host-side numpy re-implementation of reference ``utils/transforms.py``:
``flip_back`` (:15), ``fliplr_joints`` (:32), ``transform_preds`` (:49),
``get_affine_transform`` (:57, the 200px-scale MPII convention) and its
raw-scale variant (:91), ``crop`` (:149). These power the alternative
affine decode path (``validate_sync2``, core/function.py:1105-1237).
"""
from __future__ import annotations

import cv2
import numpy as np


def flip_back(output_flipped: np.ndarray, matched_parts) -> np.ndarray:
    """Unflip heatmaps + swap matched joint channels (transforms.py:15-29).
    ``output_flipped``: (B, J, H, W)."""
    out = output_flipped[:, :, :, ::-1].copy()
    for a, b in matched_parts:
        out[:, [a, b]] = out[:, [b, a]]
    return out


def fliplr_joints(joints: np.ndarray, joints_vis: np.ndarray, width: int,
                  matched_parts):
    """Flip coords + swap pairs; invisible joints zeroed
    (transforms.py:32-46)."""
    joints = joints.copy()
    joints_vis = joints_vis.copy()
    joints[:, 0] = width - joints[:, 0] - 1
    for a, b in matched_parts:
        joints[[a, b]] = joints[[b, a]]
        joints_vis[[a, b]] = joints_vis[[b, a]]
    return joints * joints_vis, joints_vis


def get_dir(src_point, rot_rad):
    sn, cs = np.sin(rot_rad), np.cos(rot_rad)
    return [src_point[0] * cs - src_point[1] * sn,
            src_point[0] * sn + src_point[1] * cs]


def get_3rd_point(a, b):
    direct = a - b
    return b + np.array([-direct[1], direct[0]], dtype=np.float32)


def get_affine_transform(center, scale, rot, output_size,
                         shift=np.array([0, 0], dtype=np.float32),
                         inv: int = 0, pixel_std: float = 200.0
                         ) -> np.ndarray:
    """MPII-convention affine (transforms.py:57-89); ``pixel_std=1`` gives
    the raw-scale variant ``get_affine_transform2`` (:91-126)."""
    if not isinstance(scale, (np.ndarray, list)):
        scale = np.array([scale, scale])
    scale_tmp = np.asarray(scale) * pixel_std
    src_w = scale_tmp[0]
    dst_w, dst_h = output_size[0], output_size[1]

    rot_rad = np.pi * rot / 180
    src_dir = get_dir([0, src_w * -0.5], rot_rad)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)

    src = np.zeros((3, 2), dtype=np.float32)
    dst = np.zeros((3, 2), dtype=np.float32)
    src[0, :] = center + scale_tmp * shift
    src[1, :] = center + src_dir + scale_tmp * shift
    dst[0, :] = [dst_w * 0.5, dst_h * 0.5]
    dst[1, :] = np.array([dst_w * 0.5, dst_h * 0.5]) + dst_dir
    src[2:, :] = get_3rd_point(src[0, :], src[1, :])
    dst[2:, :] = get_3rd_point(dst[0, :], dst[1, :])

    if inv:
        return cv2.getAffineTransform(np.float32(dst), np.float32(src))
    return cv2.getAffineTransform(np.float32(src), np.float32(dst))


def affine_transform(pt, t):
    new_pt = np.array([pt[0], pt[1], 1.0]).T
    return (t @ new_pt)[:2]


def transform_preds(coords: np.ndarray, center, scale, output_size
                    ) -> np.ndarray:
    """Map heatmap coords back to source image coords
    (transforms.py:49-54)."""
    trans = get_affine_transform(center, scale, 0, output_size, inv=1)
    out = np.zeros_like(coords)
    for p in range(coords.shape[0]):
        out[p, 0:2] = affine_transform(coords[p, 0:2], trans)
    return out


def crop(img: np.ndarray, center, scale, output_size, rot: float = 0
         ) -> np.ndarray:
    """Affine crop (transforms.py:149-157)."""
    trans = get_affine_transform(center, scale, rot, output_size)
    return cv2.warpAffine(img, trans,
                          (int(output_size[0]), int(output_size[1])),
                          flags=cv2.INTER_LINEAR)


def get_final_preds(batch_heatmaps: np.ndarray, center, scale,
                    post_process: bool = True):
    """Affine decode with quarter-pixel offset
    (core/inference.py:49-74). ``batch_heatmaps``: (B, J, H, W)."""
    from npp_tpu.utils.metrics import _np_max_preds

    coords, maxvals = _np_max_preds(batch_heatmaps)
    h, w = batch_heatmaps.shape[2], batch_heatmaps.shape[3]
    if post_process:
        for n in range(coords.shape[0]):
            for p in range(coords.shape[1]):
                hm = batch_heatmaps[n][p]
                px = int(np.floor(coords[n][p][0] + 0.5))
                py = int(np.floor(coords[n][p][1] + 0.5))
                if 1 < px < w - 1 and 1 < py < h - 1:
                    diff = np.array([hm[py][px + 1] - hm[py][px - 1],
                                     hm[py + 1][px] - hm[py - 1][px]])
                    coords[n][p] += np.sign(diff) * 0.25
    preds = coords.copy()
    for i in range(coords.shape[0]):
        preds[i] = transform_preds(coords[i], center[i], scale[i], [w, h])
    return preds, maxvals
