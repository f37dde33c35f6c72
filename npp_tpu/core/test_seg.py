"""Segmentation-only test paths: multi-scale eval + palette-PNG export.

Equivalents of reference ``testval`` (core/function.py:1339-1397:
multi-scale sliding-window eval accumulating a confusion matrix) and
``test`` (function.py:1399-1461: single-scale inference saving indexed
parsing PNGs).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from npp_tpu.core.multiscale import multi_scale_inference
from npp_tpu.utils import metrics as M
from npp_tpu.utils.vis import save_parsing_png


def make_parsing_apply_fn(model):
    """(variables, tiles) -> last-stage parsing logits at tile resolution.

    Weights are an ARGUMENT (pass them to testval/test as ``params``):
    multi_scale_inference jits the whole pipeline, and weights closed
    over here would be inlined as program constants."""
    def apply_fn(variables, tiles):
        from npp_tpu.ops.resize import resize_bilinear

        _, par_list = model.apply(variables, tiles, train=False)
        logits = par_list[-1][0].astype(jnp.float32)
        return resize_bilinear(logits, (tiles.shape[1], tiles.shape[2]),
                               align_corners=False)

    return apply_fn


def testval(apply_fn, params, loader, *, num_classes: int,
            scales=(0.5, 0.75, 1.0, 1.25, 1.5), flip: bool = True,
            crop_size=(384, 384), ignore: int = 255, mesh=None) -> dict:
    """Multi-scale seg eval over a loader of single-image batches
    (function.py:1339-1397). ``mesh`` shards each image's tile batch
    over the ``data`` axis (multi-chip multi-scale, SCALING.md)."""
    cm = np.zeros((num_classes, num_classes), np.float64)
    for batch in loader:
        image = np.asarray(batch["image"])
        label = np.asarray(batch["par"])
        assert image.shape[0] == 1, "multi-scale eval uses batch size 1"
        pred = multi_scale_inference(apply_fn, image, params=params,
                                     num_classes=num_classes,
                                     crop_size=crop_size, scales=scales,
                                     flip=flip, mesh=mesh)
        pred_labels = np.argmax(pred, axis=-1).astype(np.int32)
        cm += np.asarray(M.confusion_matrix(jnp.asarray(label),
                                            jnp.asarray(pred_labels),
                                            num_classes, ignore))
    return M.seg_metrics(cm)


def test(apply_fn, params, loader, out_dir: str, *, num_classes: int,
         scales=(1.0,), flip: bool = False,
         crop_size=(384, 384), mesh=None) -> list[str]:
    """Inference-only export of palette PNGs (function.py:1399-1461)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for batch in loader:
        image = np.asarray(batch["image"])
        names = batch["names"]
        pred = multi_scale_inference(apply_fn, image, params=params,
                                     num_classes=num_classes,
                                     crop_size=crop_size, scales=scales,
                                     flip=flip, mesh=mesh)
        labels = np.argmax(pred, axis=-1).astype(np.uint8)
        for i, name in enumerate(names):
            path = os.path.join(out_dir, f"{name}.png")
            save_parsing_png(labels[i], path, num_classes)
            paths.append(path)
    return paths
