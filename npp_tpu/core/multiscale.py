"""Multi-scale sliding-window inference for parsing.

TPU-native re-design of reference ``BaseDataset.multi_scale_inference``
(dataset/base_dataset.py:182-244): the reference loops tiles one-by-one
through the model; here all tiles of a scale are gathered into ONE batched
forward (tiles are identical shapes, so a single compiled program covers
every scale), then scatter-added with count normalization. Flip-TTA
averages logits of the horizontally flipped batch (base_dataset.py:161-180;
the exp() accumulation across scales is preserved).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from npp_tpu.ops.resize import resize_bilinear


def _tile_origins(length: int, crop: int, stride: int) -> list[int]:
    if length <= crop:
        return [0]
    n = int(np.ceil((length - crop) / stride)) + 1
    return [min(i * stride, length - crop) for i in range(n)]


def multi_scale_inference(apply_fn, image: np.ndarray, *, num_classes: int,
                          crop_size=(384, 384),
                          scales=(0.5, 0.75, 1.0, 1.25, 1.5),
                          flip: bool = True,
                          pad_value: np.ndarray | float = 0.0) -> np.ndarray:
    """``image``: (1, H, W, 3) normalized. ``apply_fn(images) -> logits``
    at input resolution (already upsampled). Returns (1, H, W, C) summed
    exp-logits across scales (base_dataset.py:241-244 semantics)."""
    _, oh, ow, _ = image.shape
    ch, cw = crop_size
    stride_h = int(ch * 2.0 / 3.0)
    stride_w = int(cw * 2.0 / 3.0)
    final = jnp.zeros((1, oh, ow, num_classes), jnp.float32)

    for scale in scales:
        long_size = int(max(oh, ow) * scale + 0.5)
        if oh > ow:
            nh, nw = long_size, int(ow * long_size / oh + 0.5)
        else:
            nh, nw = int(oh * long_size / ow + 0.5), long_size
        scaled = resize_bilinear(jnp.asarray(image), (nh, nw),
                                 align_corners=False)
        ph, pw = max(ch - nh, 0), max(cw - nw, 0)
        if ph or pw:
            scaled = jnp.pad(scaled, ((0, 0), (0, ph), (0, pw), (0, 0)),
                             constant_values=0.0)
            if not np.isscalar(pad_value):
                pv = jnp.asarray(pad_value, jnp.float32)
                mask = jnp.ones((1, nh, nw, 1), jnp.float32)
                mask = jnp.pad(mask, ((0, 0), (0, ph), (0, pw), (0, 0)))
                scaled = scaled * mask + (1 - mask) * pv
        sh, sw = scaled.shape[1], scaled.shape[2]

        ys = _tile_origins(sh, ch, stride_h)
        xs = _tile_origins(sw, cw, stride_w)
        tiles = jnp.stack([scaled[0, y:y + ch, x:x + cw, :]
                           for y in ys for x in xs])
        logits = _predict_tiles(apply_fn, tiles, flip)
        preds = jnp.zeros((sh, sw, num_classes), jnp.float32)
        count = jnp.zeros((sh, sw, 1), jnp.float32)
        k = 0
        for y in ys:
            for x in xs:
                preds = preds.at[y:y + ch, x:x + cw].add(logits[k])
                count = count.at[y:y + ch, x:x + cw].add(1.0)
                k += 1
        preds = (preds / count)[None, :nh, :nw, :]
        preds = resize_bilinear(preds, (oh, ow), align_corners=False)
        final = final + preds
    return np.asarray(final)


def _predict_tiles(apply_fn, tiles: jnp.ndarray, flip: bool) -> jnp.ndarray:
    logits = apply_fn(tiles)
    if flip:
        flipped = apply_fn(tiles[:, :, ::-1, :])
        logits = 0.5 * (logits + flipped[:, :, ::-1, :])
    # Reference returns pred.exp() per window (base_dataset.py:180).
    return jnp.exp(logits.astype(jnp.float32))
