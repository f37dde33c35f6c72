"""Affine/keypoint transform parity tests (utils/transforms.py reference)."""
import numpy as np
import pytest

from npp_tpu.utils import transforms as T


def test_flip_back_unflips_and_swaps():
    rng = np.random.default_rng(0)
    hm = rng.random((2, 4, 8, 8)).astype(np.float32)
    out = T.flip_back(hm, [(0, 1)])
    np.testing.assert_allclose(out[:, 0], hm[:, 1, :, ::-1])
    np.testing.assert_allclose(out[:, 1], hm[:, 0, :, ::-1])
    np.testing.assert_allclose(out[:, 2], hm[:, 2, :, ::-1])


def test_fliplr_joints():
    joints = np.array([[10.0, 5.0], [20.0, 6.0]])
    vis = np.array([[1.0], [1.0]])
    out, out_vis = T.fliplr_joints(joints, vis, width=100,
                                   matched_parts=[(0, 1)])
    # x -> width - x - 1, then pair swap.
    np.testing.assert_allclose(out[0], [100 - 20 - 1, 6.0])
    np.testing.assert_allclose(out[1], [100 - 10 - 1, 5.0])


def test_affine_roundtrip():
    center = np.array([100.0, 120.0])
    scale = 1.5
    t = T.get_affine_transform(center, scale, 0, (64, 64))
    t_inv = T.get_affine_transform(center, scale, 0, (64, 64), inv=1)
    pt = np.array([40.0, 30.0])
    back = T.affine_transform(T.affine_transform(pt, t), t_inv)
    np.testing.assert_allclose(back, pt, atol=1e-3)


def test_transform_preds_identity_scale():
    # With pixel_std*scale == output size and rot 0, center crop mapping.
    coords = np.array([[32.0, 32.0], [0.0, 0.0]])
    out = T.transform_preds(coords, center=np.array([32.0, 32.0]),
                            scale=64 / 200.0, output_size=[64, 64])
    np.testing.assert_allclose(out[0], [32.0, 32.0], atol=1e-4)
    np.testing.assert_allclose(out[1], [0.0, 0.0], atol=1e-4)


def test_get_final_preds_quarter_offset():
    hm = np.zeros((1, 1, 16, 16), np.float32)
    hm[0, 0, 8, 8] = 1.0
    hm[0, 0, 8, 9] = 0.5  # gradient points +x
    preds, maxvals = T.get_final_preds(hm, [np.array([8.0, 8.0])],
                                       [16 / 200.0])
    assert maxvals[0, 0, 0] == 1.0
    # peak at (8,8), offset +0.25 in x; output mapped through the affine
    # (identity-scale crop), so x ≈ 8.25.
    np.testing.assert_allclose(preds[0, 0], [8.25, 8.0], atol=1e-3)


def test_crop_shapes():
    img = np.random.default_rng(1).integers(0, 255, (100, 80, 3)).astype(
        np.uint8)
    out = T.crop(img, np.array([40.0, 50.0]), 0.5, (64, 48))
    assert out.shape == (48, 64, 3)
