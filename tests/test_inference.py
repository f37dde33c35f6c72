"""Decode parity tests vs the reference's CPU decode pipeline
(core/inference.py, core/function.py:967-989)."""
import cv2
import numpy as np
from scipy.ndimage import gaussian_filter

import jax.numpy as jnp

from npp_tpu.core import inference as inf


def test_gaussian_blur_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 48, 48, 3)).astype(np.float32)
    ours = np.asarray(inf.gaussian_blur(jnp.asarray(x), 3.0))
    for c in range(3):
        ref = gaussian_filter(x[0, :, :, c], sigma=3)
        np.testing.assert_allclose(ours[0, :, :, c], ref, atol=2e-5)


def test_get_max_preds_matches_reference():
    rng = np.random.default_rng(1)
    hm = rng.random((2, 16, 24, 5)).astype(np.float32)
    preds, maxvals = inf.get_max_preds(jnp.asarray(hm))
    # Golden: reference numpy formulation (core/inference.py:18-46).
    nchw = hm.transpose(0, 3, 1, 2)
    flat = nchw.reshape(2, 5, -1)
    idx = np.argmax(flat, 2)
    np.testing.assert_allclose(np.asarray(preds)[..., 0], idx % 24)
    np.testing.assert_allclose(np.asarray(preds)[..., 1], idx // 24)
    np.testing.assert_allclose(np.asarray(maxvals)[..., 0],
                               np.max(flat, 2), rtol=1e-6)


def test_quarter_offset_matches_reference():
    rng = np.random.default_rng(2)
    hm = rng.random((2, 16, 16, 4)).astype(np.float32)
    coords, _ = inf.get_max_preds(jnp.asarray(hm))
    ours = np.asarray(inf.post_process_quarter_offset(coords,
                                                      jnp.asarray(hm)))
    # Golden loop (core/inference.py:56-65).
    c = np.asarray(coords).copy()
    nchw = hm.transpose(0, 3, 1, 2)
    for n in range(2):
        for p in range(4):
            m = nchw[n][p]
            px = int(np.floor(c[n][p][0] + 0.5))
            py = int(np.floor(c[n][p][1] + 0.5))
            if 1 < px < 15 and 1 < py < 15:
                diff = np.array([m[py][px + 1] - m[py][px - 1],
                                 m[py + 1][px] - m[py - 1][px]])
                c[n][p] += np.sign(diff) * 0.25
    np.testing.assert_allclose(ours, c, atol=1e-6)


def test_decode_pose_validate_matches_reference_loop():
    """Full decode chain vs the reference per-joint CPU loop
    (core/function.py:971-989)."""
    rng = np.random.default_rng(3)
    b, h, w, j = 2, 24, 24, 4
    out = 96
    pred = rng.random((b, h, w, j)).astype(np.float32)
    flip = rng.random((b, h, w, j)).astype(np.float32)
    crop_param = np.array([[[5, 7, 2, 3, 100, 100, 90, 90]],
                           [[0, 0, 0, 0, 96, 96, 96, 96]]], np.float32)
    scale = np.array([0.5, 1.25], np.float32)

    flipped_idx = list(range(j))  # identity remap for j=4 test
    ours = np.asarray(inf.decode_pose_validate.__wrapped__(
        jnp.asarray(pred), None, jnp.asarray(crop_param),
        jnp.asarray(scale), (out, out), 3.0))

    for n in range(b):
        for ji in range(j):
            heat = cv2.resize(pred[n, :, :, ji], (out, out),
                              interpolation=cv2.INTER_LINEAR)
            heat = gaussian_filter(heat, sigma=3)
            pos = np.unravel_index(heat.argmax(), heat.shape)
            px = (pos[1] - crop_param[n, 0, 2] + crop_param[n, 0, 0]) / scale[n]
            py = (pos[0] - crop_param[n, 0, 3] + crop_param[n, 0, 1]) / scale[n]
            np.testing.assert_allclose(ours[n, ji, 0], px, atol=1.01)
            np.testing.assert_allclose(ours[n, ji, 1], py, atol=1.01)
            np.testing.assert_allclose(ours[n, ji, 2],
                                       heat[pos[0], pos[1]], atol=1e-3)


def test_flip_parsing_fuse_swaps_and_unflips():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 4, 4, 20)).astype(np.float32)
    fl = rng.standard_normal((1, 4, 4, 20)).astype(np.float32)
    fused = np.asarray(inf.flip_parsing_fuse(jnp.asarray(x),
                                             jnp.asarray(fl)))
    manual = fl.copy()
    for a, b in ((14, 15), (16, 17), (18, 19)):
        manual[..., [a, b]] = manual[..., [b, a]]
    manual = manual[:, :, ::-1, :]
    np.testing.assert_allclose(fused, 0.5 * (x + manual), atol=1e-6)


def test_dark_decode_recovers_subpixel_center():
    """DARK refinement (arXiv:1910.06278) on a Gaussian peak: the log
    heatmap is quadratic, so -H^{-1}grad recovers the continuous center
    to ~1e-2 px where plain argmax errs by up to 0.5 px and the
    reference quarter-offset by up to 0.25 px."""
    import jax.numpy as jnp

    from npp_tpu.core.inference import (gaussian_blur, get_max_preds,
                                        post_process_dark,
                                        post_process_quarter_offset)

    h, w, sigma = 48, 64, 2.0
    centers = np.array([[17.35, 11.62], [40.71, 30.28]])  # (x, y)
    yy, xx = np.mgrid[0:h, 0:w]
    hm = np.stack([np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                          / (2 * sigma ** 2)) for cx, cy in centers],
                  axis=-1)[None].astype(np.float32)
    hm = gaussian_blur(jnp.asarray(hm), 3.0)

    coords, _ = get_max_preds(hm)
    dark = np.asarray(post_process_dark(coords, hm))[0]
    quarter = np.asarray(post_process_quarter_offset(coords, hm))[0]
    base = np.asarray(coords)[0]

    err_dark = np.abs(dark - centers).max()
    err_quarter = np.abs(quarter - centers).max()
    err_base = np.abs(base - centers).max()
    assert err_dark < 0.03, (err_dark, dark, centers)
    assert err_dark < err_quarter < err_base + 1e-6, (
        err_dark, err_quarter, err_base)


def test_decode_pose_validate_dark():
    """decode_pose_validate(dark=True) pipes the refinement through the
    full decode (resize + blur + inverse crop map) and stays within a
    pixel of the non-dark decode (same peaks, sub-pixel shift only)."""
    import jax.numpy as jnp

    from npp_tpu.core.inference import decode_pose_validate

    rng = np.random.default_rng(3)
    hm = rng.random((2, 24, 24, 16)).astype(np.float32)
    crop = np.zeros((2, 1, 8), np.float32)
    scale = np.ones((2,), np.float32)
    kw = dict(out_hw=(96, 96), blur_sigma=3.0)
    a = np.asarray(decode_pose_validate(jnp.asarray(hm), None,
                                        jnp.asarray(crop),
                                        jnp.asarray(scale), **kw))
    b = np.asarray(decode_pose_validate(jnp.asarray(hm), None,
                                        jnp.asarray(crop),
                                        jnp.asarray(scale), dark=True,
                                        **kw))
    assert np.abs(a[..., :2] - b[..., :2]).max() < 1.0
    np.testing.assert_allclose(a[..., 2], b[..., 2])  # scores unchanged


def test_fuse_multiscale_pose_single_scale_identity():
    """S=1 with sm=1 and a full-canvas valid region is an identity
    resample (bilinear at integer coordinates)."""
    rng = np.random.default_rng(4)
    hm = rng.random((1, 2, 32, 32, 3)).astype(np.float32)
    # [crop_sx, crop_sy, store_sx, store_sy, crop_ex, crop_ey,
    #  store_ex, store_ey] — valid region covers the whole canvas.
    cp = np.zeros((1, 2, 1, 8), np.float32)
    cp[..., 4:] = 32.0
    out = np.asarray(inf.fuse_multiscale_pose(jnp.asarray(hm),
                                              jnp.asarray(cp), (1.0,), 0))
    np.testing.assert_allclose(out, hm[0], atol=1e-6)


def test_fuse_multiscale_pose_alignment_through_decode():
    """End-to-end scale-list alignment: a peak planted at the SAME
    original-image point in each scale's canvas must fuse constructively
    and decode back to that point (reference eval_util.py:82-268
    protocol, sub-pixel affine formulation)."""
    from npp_tpu.core.inference import decode_pose_fused

    class _Geom:  # only Predictor.preprocess geometry, no model needed
        crop_size = (64, 64)
        from npp_tpu.core.predictor import Predictor as _P
        preprocess = _P.preprocess

    g = _Geom()
    im = np.zeros((100, 80, 3), np.uint8)
    scale_mults = (0.75, 1.0, 1.25)
    x_orig = np.array([40.0, 30.0])  # (x, y) in original coords
    hms, cps = [], []
    base = None
    for sm in scale_mults:
        _, cp, s = g.preprocess(im, scale_mult=sm)
        if sm == 1.0:
            base = (cp, s)
        # p = x*scale - crop_start + store_start (inverse of the decode
        # map); plant a delta at the rounded pixel.
        px = int(round(x_orig[0] * s - cp[0, 0] + cp[0, 2]))
        py = int(round(x_orig[1] * s - cp[0, 1] + cp[0, 3]))
        hm = np.zeros((1, 64, 64, 1), np.float32)
        hm[0, py, px, 0] = 1.0
        hms.append(hm)
        cps.append(cp[None])
    fused = inf.fuse_multiscale_pose(jnp.asarray(np.stack(hms)),
                                     jnp.asarray(np.stack(cps)),
                                     scale_mults, 1)
    kp = np.asarray(decode_pose_fused(fused, jnp.asarray(base[0][None]),
                                      jnp.asarray([base[1]], np.float32),
                                      blur_sigma=3.0))
    # Rounding of the planted pixel is +-0.5 canvas px per scale; the
    # inverse map divides by scale (0.64) -> allow ~2.5 px.
    assert np.abs(kp[0, 0, :2] - x_orig).max() < 2.5, kp
    assert kp[0, 0, 2] > 0
