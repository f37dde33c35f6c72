"""Standalone inference API: one image in, parsing + keypoints out.

Working replacement for the reference's bit-rotted ``utils/eval_util.py``
(single/multi-image multi-scale + flip TTA testing; imports a nonexistent
module, SURVEY.md §8): wraps preprocessing (long-side scale + center crop,
data_loader.py eval path), the jitted TTA forward, on-device decode, and
inverse mapping to original image coordinates.
"""
from __future__ import annotations

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from npp_tpu.core.inference import decode_pose_validate, flip_parsing_fuse
from npp_tpu.ops.resize import resize_bilinear


class Predictor:
    """Joint parsing + pose predictor for raw RGB images."""

    def __init__(self, model, variables, *, crop_size=(384, 384),
                 flip_test: bool = True,
                 flip_pairs=((14, 15), (16, 17), (18, 19)),
                 blur_sigma: float = 3.0):
        self.model = model
        self.variables = variables
        self.crop_size = crop_size
        self.flip_test = flip_test
        self.flip_pairs = flip_pairs
        self.blur_sigma = blur_sigma

        from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        def fwd(variables, image_u8):
            # uint8 upload (4x fewer host->device bytes per request);
            # ImageNet normalization runs fused on device.
            image = (image_u8.astype(jnp.float32) / 255.0 - mean) / std
            pose_list, par_list = model.apply(variables, image, train=False)
            return (pose_list[-1][0].astype(jnp.float32),
                    par_list[-1][0].astype(jnp.float32))

        self._fwd = jax.jit(fwd)

    def preprocess(self, im_rgb: np.ndarray):
        """Eval-path geometry (data_loader.py:221-237): long-side scale to
        crop size, center crop, normalize."""
        cw, ch = self.crop_size
        scale = float(cw) / max(im_rgb.shape[0], im_rgb.shape[1])
        scaled = cv2.resize(im_rgb, None, fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        h, w = scaled.shape[:2]
        canvas = np.zeros((ch, cw, 3), np.float32) + 128.0
        cy, cx = h / 2.0, w / 2.0
        off_sx, off_sy = int(cx - cw / 2.0), int(cy - ch / 2.0)
        crop_sx, crop_sy = max(off_sx, 0), max(off_sy, 0)
        store_sx, store_sy = max(-off_sx, 0), max(-off_sy, 0)
        crop_ex = min(int(cx + cw / 2.0), w - 1)
        crop_ey = min(int(cy + ch / 2.0), h - 1)
        store_ex = store_sx + (crop_ex - crop_sx)
        store_ey = store_sy + (crop_ey - crop_sy)
        canvas[store_sy:store_ey, store_sx:store_ex] = \
            scaled[crop_sy:crop_ey, crop_sx:crop_ex]
        crop_param = np.array([[crop_sx, crop_sy, store_sx, store_sy,
                                crop_ex, crop_ey, store_ex, store_ey]],
                              np.float32)
        return canvas.astype(np.uint8), crop_param, scale

    def __call__(self, im_rgb: np.ndarray) -> dict:
        """Returns {'parsing': (H, W) labels in original size,
        'keypoints': (J, 3) x,y,score in original coords,
        'parsing_crop': labels at crop size}."""
        cw, ch = self.crop_size
        img, crop_param, scale = self.preprocess(im_rgb)
        batch = jnp.asarray(img)[None]
        pose_hm, par_logits = self._fwd(self.variables, batch)
        if self.flip_test:
            fp_hm, fp_par = self._fwd(self.variables, batch[:, :, ::-1, :])
        else:
            fp_hm = None

        par = resize_bilinear(par_logits, (ch, cw), align_corners=False)
        if self.flip_test:
            fpar = resize_bilinear(fp_par, (ch, cw), align_corners=False)
            par = flip_parsing_fuse(par, fpar, self.flip_pairs)
        par_crop = np.asarray(jnp.argmax(par, axis=-1)[0], np.uint8)

        n_j = pose_hm.shape[-1]
        from npp_tpu.core.inference import (FLIPPED_POSEIDX,
                                            FLIPPED_POSEIDX_PPP)
        fidx = (FLIPPED_POSEIDX if n_j == 16 else FLIPPED_POSEIDX_PPP
                if n_j == 14 else tuple(range(n_j)))
        kp = decode_pose_validate(pose_hm, fp_hm,
                                  jnp.asarray(crop_param)[None],
                                  jnp.asarray([scale]), (ch, cw),
                                  self.blur_sigma, fidx)
        keypoints = np.asarray(kp[0])

        # Map the crop parsing back to original-size labels: undo the
        # center crop then resize with nearest interpolation.
        oh, ow = im_rgb.shape[:2]
        cp = crop_param[0].astype(int)
        sh = int(round(oh * scale))
        sw = int(round(ow * scale))
        full = np.zeros((sh, sw), np.uint8)
        full[cp[1]:cp[5], cp[0]:cp[4]] = par_crop[cp[3]:cp[7], cp[2]:cp[6]]
        parsing = cv2.resize(full, (ow, oh),
                             interpolation=cv2.INTER_NEAREST)
        return {"parsing": parsing, "keypoints": keypoints,
                "parsing_crop": par_crop}
