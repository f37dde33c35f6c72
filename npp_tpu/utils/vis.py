"""Visualization and debug-dump utilities.

Re-implements the reference's visual debugging surface:
- parsing palette + indexed-PNG saving (core/function.py:1399-1486 ``test``
  / ``get_palette``);
- gaussian-map and parsing overlays (dataset/vis_utils.py:17-105);
- batch debug grids of images with joints / heatmaps (utils/vis.py:20-119).
"""
from __future__ import annotations

import os

import cv2
import numpy as np


def get_palette(num_cls: int) -> list[int]:
    """PASCAL-style color palette (core/function.py:1463-1486)."""
    n = num_cls
    palette = [0] * (n * 3)
    for j in range(n):
        lab = j
        palette[j * 3 + 0] = 0
        palette[j * 3 + 1] = 0
        palette[j * 3 + 2] = 0
        i = 0
        while lab:
            palette[j * 3 + 0] |= ((lab >> 0) & 1) << (7 - i)
            palette[j * 3 + 1] |= ((lab >> 1) & 1) << (7 - i)
            palette[j * 3 + 2] |= ((lab >> 2) & 1) << (7 - i)
            i += 1
            lab >>= 3
    return palette


def save_parsing_png(pred: np.ndarray, path: str, num_cls: int = 20) -> None:
    """Save an indexed-color parsing PNG (function.py:1447-1461)."""
    from PIL import Image

    img = Image.fromarray(pred.astype(np.uint8)).convert("P")
    img.putpalette(get_palette(num_cls))
    img.save(path)


def colorize_parsing(pred: np.ndarray, num_cls: int = 20) -> np.ndarray:
    """(H, W) labels -> (H, W, 3) uint8 RGB."""
    pal = np.array(get_palette(max(num_cls, int(pred.max()) + 1)),
                   np.uint8).reshape(-1, 3)
    return pal[pred.astype(np.int64)]


def overlay_parsing(image_rgb: np.ndarray, pred: np.ndarray,
                    alpha: float = 0.5, num_cls: int = 20) -> np.ndarray:
    color = colorize_parsing(pred, num_cls)
    return cv2.addWeighted(image_rgb.astype(np.uint8), 1 - alpha, color,
                           alpha, 0)


def overlay_heatmap(image_rgb: np.ndarray, heatmap: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Gaussian-map overlay (dataset/vis_utils.py:17-38)."""
    hm = np.clip(heatmap, 0, 1)
    hm = (hm * 255).astype(np.uint8)
    hm = cv2.resize(hm, (image_rgb.shape[1], image_rgb.shape[0]))
    hm_color = cv2.applyColorMap(hm, cv2.COLORMAP_JET)[:, :, ::-1]
    return cv2.addWeighted(image_rgb.astype(np.uint8), 1 - alpha, hm_color,
                           alpha, 0)


# Internal 16-joint skeleton (LIP order, data_loader.py:241-246).
LIP_SKELETON = ((1, 0), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7),
                (1, 14), (14, 15), (15, 8), (8, 9), (9, 10), (15, 11),
                (11, 12), (12, 13))


def draw_skeleton(image_rgb: np.ndarray, joints: np.ndarray,
                  visibility=None, skeleton=LIP_SKELETON,
                  radius: int = 3) -> np.ndarray:
    """Pose skeleton drawing (dataset/vis_utils.py:106-138)."""
    out = image_rgb.astype(np.uint8).copy()
    vis = (np.ones(len(joints)) if visibility is None
           else np.asarray(visibility))
    for a, b in skeleton:
        if a < len(joints) and b < len(joints) and vis[a] and vis[b]:
            pa = tuple(np.round(joints[a]).astype(int))
            pb = tuple(np.round(joints[b]).astype(int))
            cv2.line(out, pa, pb, (0, 255, 0), 2)
    for j, (x, y) in enumerate(joints):
        if vis[j]:
            cv2.circle(out, (int(round(x)), int(round(y))), radius,
                       (255, 0, 0), -1)
    return out


def save_debug_batch(images: np.ndarray, joints: np.ndarray, out_dir: str,
                     prefix: str = "debug", visibility=None,
                     mean=(0.485, 0.456, 0.406),
                     std=(0.229, 0.224, 0.225)) -> list[str]:
    """Batch joint-overlay dumps (utils/vis.py:20-52 equivalent)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(images.shape[0]):
        img = images[i] * np.asarray(std) + np.asarray(mean)
        img = np.clip(img * 255, 0, 255).astype(np.uint8)
        vis = None if visibility is None else visibility[i]
        drawn = draw_skeleton(img, joints[i], vis)
        path = os.path.join(out_dir, f"{prefix}_{i}.png")
        cv2.imwrite(path, drawn[:, :, ::-1])
        paths.append(path)
    return paths
