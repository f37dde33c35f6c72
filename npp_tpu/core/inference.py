"""Heatmap decoding — batched, on-device (jit) with numpy reference paths.

TPU-native re-design of reference ``core/inference.py`` and the CPU decode
hot loop in ``core/function.py:967-989``:
- :func:`get_max_preds` — batch argmax -> (x, y) + maxvals
  (core/inference.py:18-46);
- :func:`post_process_quarter_offset` — quarter-pixel gradient offset
  (core/inference.py:56-65);
- :func:`gaussian_blur` — scipy ``gaussian_filter(sigma, mode='reflect')``
  equivalent as a separable depthwise conv;
- :func:`decode_pose_validate` — the full validate-time decode: upsample
  heatmap to crop size, flip-fuse, blur, argmax, inverse crop/scale mapping
  (function.py:971-989), vectorized over batch and joints on device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from npp_tpu.ops.resize import resize_bilinear

# Pose stream left/right remap under horizontal flip.
# LIP 16 joints (core/function.py:908); PPP 14 joints
# (core/function_ppp.py:905).
FLIPPED_POSEIDX = (0, 1, 5, 6, 7, 2, 3, 4, 11, 12, 13, 8, 9, 10, 14, 15)
FLIPPED_POSEIDX_PPP = (0, 1, 8, 9, 10, 11, 12, 13, 2, 3, 4, 5, 6, 7)


def get_max_preds(batch_heatmaps: jnp.ndarray):
    """Argmax decode. ``batch_heatmaps``: (B, H, W, J) NHWC.

    Returns preds (B, J, 2) in (x, y) and maxvals (B, J, 1); predictions
    with non-positive maxval are zeroed (core/inference.py:42-45).
    """
    b, h, w, j = batch_heatmaps.shape
    flat = batch_heatmaps.transpose(0, 3, 1, 2).reshape(b, j, h * w)
    idx = jnp.argmax(flat, axis=2)
    maxvals = jnp.max(flat, axis=2)[..., None]
    x = (idx % w).astype(jnp.float32)
    y = jnp.floor(idx.astype(jnp.float32) / w)
    preds = jnp.stack([x, y], axis=-1)
    mask = (maxvals > 0.0).astype(jnp.float32)
    return preds * mask, maxvals


def post_process_quarter_offset(coords: jnp.ndarray,
                                batch_heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Quarter-pixel offset toward the gradient (core/inference.py:56-65)."""
    b, h, w, j = batch_heatmaps.shape
    hm = batch_heatmaps.transpose(0, 3, 1, 2)  # (B, J, H, W)
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    inb = (px > 1) & (px < w - 1) & (py > 1) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    def gather(dy, dx):
        yy = pyc + dy
        xx = pxc + dx
        bi = jnp.arange(b)[:, None]
        ji = jnp.arange(j)[None, :]
        return hm[bi, ji, yy, xx]

    diff_x = gather(0, 1) - gather(0, -1)
    diff_y = gather(1, 0) - gather(-1, 0)
    offset = jnp.stack([jnp.sign(diff_x), jnp.sign(diff_y)], axis=-1) * 0.25
    return coords + offset * inb[..., None].astype(coords.dtype)


def post_process_dark(coords: jnp.ndarray,
                      batch_heatmaps: jnp.ndarray) -> jnp.ndarray:
    """DARK sub-pixel refinement (Zhang et al., arXiv:1910.06278 §3.1;
    PAPERS.md): Taylor-expand the LOG heatmap at the argmax and step to
    the quadratic's stationary point, ``offset = -H^{-1} ∇``.

    For a Gaussian peak the log is exactly quadratic, so this recovers
    the continuous maximum to numerical precision where the reference's
    quarter-pixel sign offset (:func:`post_process_quarter_offset`,
    core/inference.py:56-65) is biased by up to 0.25 px — a strictly
    better decode the reference does not have (opt-in to preserve
    metric parity: ``decode_pose_validate(..., dark=True)`` /
    ``Predictor(dark_decode=True)``).

    ``batch_heatmaps`` should already be smoothed (the validate decode
    blurs with sigma=3) — DARK's distribution modulation step.
    """
    b, h, w, j = batch_heatmaps.shape
    hm = jnp.log(jnp.maximum(batch_heatmaps, 1e-10)).transpose(0, 3, 1, 2)
    px = jnp.floor(coords[..., 0] + 0.5).astype(jnp.int32)
    py = jnp.floor(coords[..., 1] + 0.5).astype(jnp.int32)
    inb = (px > 0) & (px < w - 1) & (py > 0) & (py < h - 1)
    pxc = jnp.clip(px, 1, w - 2)
    pyc = jnp.clip(py, 1, h - 2)

    def gather(dy, dx):
        bi = jnp.arange(b)[:, None]
        ji = jnp.arange(j)[None, :]
        return hm[bi, ji, pyc + dy, pxc + dx]

    c0 = gather(0, 0)
    dx = 0.5 * (gather(0, 1) - gather(0, -1))
    dy = 0.5 * (gather(1, 0) - gather(-1, 0))
    dxx = gather(0, 1) - 2.0 * c0 + gather(0, -1)
    dyy = gather(1, 0) - 2.0 * c0 + gather(-1, 0)
    dxy = 0.25 * (gather(1, 1) - gather(1, -1)
                  - gather(-1, 1) + gather(-1, -1))
    det = dxx * dyy - dxy * dxy
    # -H^{-1} @ grad, guarded against a singular/indefinite Hessian.
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    ox = -(dyy * dx - dxy * dy) / safe
    oy = -(dxx * dy - dxy * dx) / safe
    ok = (inb & (jnp.abs(det) > 1e-12)
          & (jnp.abs(ox) < 1.0) & (jnp.abs(oy) < 1.0))
    offset = jnp.stack([ox, oy], axis=-1) * ok[..., None].astype(
        coords.dtype)
    return coords + offset


@functools.lru_cache(maxsize=None)
def _gauss_kernel(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage 1-D gaussian kernel (normalized, radius=trunc*sigma)."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, sigma: float,
                  truncate: float = 4.0) -> jnp.ndarray:
    """Separable gaussian blur of NHWC maps, scipy 'reflect' (symmetric)
    boundary — parity with ``gaussian_filter(heatmap, sigma=3)``
    (core/function.py:982)."""
    k = jnp.asarray(_gauss_kernel(float(sigma), truncate))
    r = (k.shape[0] - 1) // 2
    c = x.shape[-1]
    kh = jnp.tile(k.reshape(-1, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, -1, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jnp.pad(x, ((0, 0), (r, r), (r, r), (0, 0)), mode="symmetric")
    # HIGHEST precision: decode parity depends on exact peak locations.
    prec = jax.lax.Precision.HIGHEST
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c, precision=prec)
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c, precision=prec)
    return x


@functools.partial(jax.jit, static_argnames=("out_hw", "blur_sigma",
                                              "flip_idx", "dark"))
def decode_pose_validate(pred_pose: jnp.ndarray,
                         flip_pred_pose: jnp.ndarray | None,
                         crop_param: jnp.ndarray,
                         base_scale: jnp.ndarray,
                         out_hw: tuple[int, int] = (384, 384),
                         blur_sigma: float = 3.0,
                         flip_idx: tuple = FLIPPED_POSEIDX,
                         dark: bool = False) -> jnp.ndarray:
    """Validate-time pose decode, fully on device (function.py:967-989).

    ``pred_pose``: (B, h, w, J) raw heatmaps at model resolution.
    ``flip_pred_pose``: heatmaps of the flipped image (same layout) or None.
    ``crop_param``: (B, 1, 8) crop params from the loader; ``base_scale``:
    (B,) scale factors. Returns (B, J, 3): x, y in original image coords
    plus peak score.
    """
    hm = resize_bilinear(pred_pose.astype(jnp.float32), out_hw,
                         align_corners=False)
    if flip_pred_pose is not None:
        fl = flip_pred_pose.astype(jnp.float32)
        fl = fl[..., jnp.asarray(flip_idx[:fl.shape[-1]])]
        fl = resize_bilinear(fl, out_hw, align_corners=False)
        fl = fl[:, :, ::-1, :]  # unflip horizontally
        hm = 0.5 * (hm + fl)
    return decode_pose_fused(hm, crop_param, base_scale,
                             blur_sigma=blur_sigma, dark=dark)


def decode_pose_fused(hm: jnp.ndarray, crop_param: jnp.ndarray,
                      base_scale: jnp.ndarray, *, blur_sigma: float = 3.0,
                      dark: bool = False) -> jnp.ndarray:
    """Decode tail for heatmaps already fused at crop resolution:
    blur -> argmax (-> DARK) -> inverse crop/scale map. ``hm``:
    (B, ch, cw, J) flip/scale-fused heatmaps."""
    hm = gaussian_blur(hm, blur_sigma)
    preds, maxvals = get_max_preds(hm)
    if dark:
        preds = post_process_dark(preds, hm)
    # Inverse map from crop coords to original image coords
    # (function.py:984-985): p_src = (p - store_start + crop_start) / scale.
    cp = crop_param[:, 0, :].astype(jnp.float32)
    dx = cp[:, 0] - cp[:, 2]
    dy = cp[:, 1] - cp[:, 3]
    s = base_scale.astype(jnp.float32)
    x = (preds[..., 0] + dx[:, None]) / s[:, None]
    y = (preds[..., 1] + dy[:, None]) / s[:, None]
    return jnp.stack([x, y, maxvals[..., 0]], axis=-1)


def fuse_multiscale_pose(hm: jnp.ndarray, crop_params: jnp.ndarray,
                         scale_mults: tuple, base_index: int) -> jnp.ndarray:
    """Fuse per-scale pose heatmaps into base-scale canvas coordinates
    (the scale-list pose TTA of the reference's standalone tester,
    utils/eval_util.py:201-227).

    ``hm``: (S, B, H, W, J) heatmaps upsampled to crop resolution, one
    per scale multiplier; ``crop_params``: (S, B, 1, 8) loader crop
    params for each scale's canvas. Returns (B, H, W, J).

    TPU-first formulation: instead of the reference's un-crop /
    cv2.resize / int-rounded center paste, each scale's canvas is
    resampled onto the base canvas with one bilinear gather over an
    affine grid derived from the crop params (sub-pixel exact; both
    canvases are center crops of the same image so the alignment is the
    same transform the reference approximates). Samples falling outside
    a scale's VALID (non-padding) region contribute zero, matching the
    reference's paste-into-zeros; the average divides by the number of
    scales uniformly (eval_util.py:226)."""
    s, b, h, w, j = hm.shape
    cp = crop_params[:, :, 0, :].astype(jnp.float32)        # (S, B, 8)
    dx = cp[..., 0] - cp[..., 2]                             # crop_s - store_s
    dy = cp[..., 1] - cp[..., 3]
    sm = jnp.asarray(scale_mults, jnp.float32)               # (S,)
    gy = jnp.arange(h, dtype=jnp.float32)
    gx = jnp.arange(w, dtype=jnp.float32)
    # Base-canvas pixel p1 maps to original coords X = (p1 + d_base)/s1
    # and into scale-s canvas at p_s = X * s1 * sm_s - d_s.
    ys = ((gy[None, None, :] + dy[base_index][None, :, None])
          * sm[:, None, None] - dy[:, :, None])              # (S, B, H)
    xs = ((gx[None, None, :] + dx[base_index][None, :, None])
          * sm[:, None, None] - dx[:, :, None])              # (S, B, W)
    ys2 = jnp.broadcast_to(ys[..., None], (s, b, h, w))
    xs2 = jnp.broadcast_to(xs[:, :, None, :], (s, b, h, w))
    # Zero outside each scale's valid (store) region: the canvas padding
    # carries model output the reference never pastes.
    valid = ((xs2 >= cp[..., 2, None, None])
             & (xs2 <= cp[..., 6, None, None] - 1.0)
             & (ys2 >= cp[..., 3, None, None])
             & (ys2 <= cp[..., 7, None, None] - 1.0))
    # Clamp sample coords into the valid pixel range [store_s, store_e-1]
    # before the order-1 gather so no bilinear support ever touches the
    # padding-region model output at store_e (the reference's hard crop,
    # eval_util.py:207, excludes it); masked-out samples are zeroed below
    # regardless, so this only affects the boundary epsilon.
    xs2 = jnp.clip(xs2, cp[..., 2, None, None], cp[..., 6, None, None] - 1.0)
    ys2 = jnp.clip(ys2, cp[..., 3, None, None], cp[..., 7, None, None] - 1.0)

    def sample_one(hm_sb, yy, xx):                           # (H, W, J)
        def per_j(ch):
            return jax.scipy.ndimage.map_coordinates(
                ch, [yy, xx], order=1, mode="constant", cval=0.0)
        return jax.vmap(per_j, in_axes=-1, out_axes=-1)(hm_sb)

    out = jax.vmap(jax.vmap(sample_one))(hm.astype(jnp.float32), ys2, xs2)
    out = out * valid[..., None].astype(jnp.float32)
    return out.mean(axis=0)


def flip_parsing_fuse(pred_par: jnp.ndarray, flip_pred_par: jnp.ndarray,
                      flip_pairs=((14, 15), (16, 17), (18, 19))
                      ) -> jnp.ndarray:
    """Average direct and flipped parsing logits with left/right channel
    swap (function.py:931-939) — explicit gather, avoiding the reference's
    aliasing bug (SURVEY.md §8)."""
    c = pred_par.shape[-1]
    perm = list(range(c))
    for a, b in flip_pairs:
        perm[a], perm[b] = perm[b], perm[a]
    fl = flip_pred_par[..., jnp.asarray(perm)]
    fl = fl[:, :, ::-1, :]
    return 0.5 * (pred_par + fl)
