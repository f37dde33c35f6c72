"""Data pipeline tests: synthetic dataset, collate, device renderer,
loader iteration, LIP-format loading from generated fixtures."""
import json
import os

import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from npp_tpu.data import (DataLoader, LIPDataset, SyntheticDataset, collate,
                          make_target_renderer)


def test_synthetic_sample_shapes():
    ds = SyntheticDataset(length=4, crop_size=(96, 96), num_joints=16)
    s = ds[0]
    assert s["image"].shape == (96, 96, 3)
    assert s["par"].shape == (96, 96)
    assert s["joints"].shape == (16, 2)
    assert s["visibility"].shape == (16,)
    assert s["crop_param"].shape == (1, 8)
    # Deterministic per index.
    s2 = ds[0]
    np.testing.assert_array_equal(s["image"], s2["image"])


def test_loader_renders_targets_on_device():
    ds = SyntheticDataset(length=8, crop_size=(96, 96), num_joints=16)
    renderer = make_target_renderer(stride=4, sigma=3, num_joints=16)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        renderer=renderer)
    batches = list(loader)
    assert len(batches) == 2
    b = batches[0]
    assert b["image"].shape == (4, 96, 96, 3)
    assert b["pose"].shape == (4, 24, 24, 16)
    assert b["pose_aux"].shape == (4, 24, 24, 16)
    assert b["edge"].shape == (4, 96, 96)
    assert len(b["names"]) == 4
    pose = np.asarray(b["pose"])
    assert pose.max() <= 1.0 + 1e-6 and pose.max() > 0.5
    edge = np.asarray(b["edge"])
    assert set(np.unique(edge)).issubset({0, 1, 255})


def test_device_normalize_matches_host_path():
    # uint8-transfer mode: dataset ships raw uint8, the renderer applies
    # the ImageNet normalization on device — batches must equal the
    # host-normalized float path to float rounding.
    host_ds = SyntheticDataset(length=8, crop_size=(96, 96), num_joints=16)
    dev_ds = SyntheticDataset(length=8, crop_size=(96, 96), num_joints=16,
                              device_normalize=True)
    host_loader = DataLoader(
        host_ds, batch_size=4, shuffle=False, num_workers=2,
        renderer=make_target_renderer(stride=4, sigma=3, num_joints=16))
    dev_loader = DataLoader(
        dev_ds, batch_size=4, shuffle=False, num_workers=2,
        renderer=make_target_renderer(stride=4, sigma=3, num_joints=16,
                                      normalize_images=True))
    for hb, db in zip(host_loader, dev_loader):
        assert db["image"].dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(db["image"]),
                                   np.asarray(hb["image"]), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(db["edge"]),
                                      np.asarray(hb["edge"]))
        np.testing.assert_allclose(np.asarray(db["pose"]),
                                   np.asarray(hb["pose"]), atol=1e-6)


def test_uint8_without_normalizing_renderer_raises():
    ds = SyntheticDataset(length=4, crop_size=(96, 96), num_joints=16,
                          device_normalize=True)
    loader = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1,
                        renderer=make_target_renderer(stride=4, sigma=3,
                                                      num_joints=16))
    with pytest.raises(ValueError, match="uint8"):
        next(iter(loader))


def test_fast_lip_device_normalize_eval_parity(tmp_path):
    # The native uint8 warp must match the native float warp after device
    # normalization, up to the uint8 rounding quantum.
    from npp_tpu.data import fast_aug
    from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD

    if not fast_aug.is_available():
        pytest.skip("native library not built")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (120, 100, 3)).astype(np.uint8)
    lab = rng.integers(0, 20, (120, 100)).astype(np.uint8)
    f32, l1, _ = fast_aug.fused_augment(
        img, lab, None, scale=1.1, rot_deg=20.0, crop_dx=-4.0, crop_dy=6.0,
        flip=True, out_hw=(96, 96))
    u8, l2, _ = fast_aug.fused_augment(
        img, lab, None, scale=1.1, rot_deg=20.0, crop_dx=-4.0, crop_dy=6.0,
        flip=True, out_hw=(96, 96), as_uint8=True)
    np.testing.assert_array_equal(l1, l2)
    renorm = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    # half-quantum rounding / min std ~= 0.5/255/0.224
    assert np.abs(renorm - f32).max() < 0.5 / 255.0 / IMAGENET_STD.min() \
        + 1e-5


def test_loader_shuffle_reseeds_by_epoch():
    ds = SyntheticDataset(length=16, crop_size=(32, 32))
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=1)
    loader.set_epoch(0)
    names0 = [n for b in loader for n in b["names"]]
    loader.set_epoch(1)
    names1 = [n for b in loader for n in b["names"]]
    assert names0 != names1
    assert sorted(names0) == sorted(names1)


@pytest.fixture
def lip_fixture(tmp_path):
    """Minimal on-disk LIP-format dataset."""
    root = tmp_path
    (root / "ims").mkdir()
    (root / "segs").mkdir()
    rng = np.random.default_rng(0)
    annos = []
    for i in range(3):
        name = f"im{i}.jpg"
        img = rng.integers(0, 255, (120, 100, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "ims" / name), img)
        # Blocky region labels (real parsing masks are regions, and the
        # fast path's single nearest warp only differs from the reference's
        # chained nearest resamples at region boundaries).
        par = np.zeros((120, 100), np.uint8)
        for _ in range(12):
            y0, x0 = rng.integers(0, 100), rng.integers(0, 80)
            par[y0:y0 + 30, x0:x0 + 25] = rng.integers(0, 20)
        cv2.imwrite(str(root / "segs" / f"im{i}.png"), par)
        joints = rng.uniform(10, 90, (16, 3)).tolist()
        annos.append({"im_name": name, "joint_self": joints,
                      "objpos": [50.0, 60.0], "scale_provided": 1.2})
    with open(root / "annos.json", "w") as f:
        json.dump({"root": annos}, f)
    return str(root)


def test_lip_dataset_train_and_eval_modes(lip_fixture):
    for is_train in (True, False):
        ds = LIPDataset(lip_fixture, "ims", "annos.json", "segs",
                        crop_size=(96, 96), is_train=is_train, seed=0)
        assert len(ds) == 3
        s = ds[0]
        assert s["image"].shape == (96, 96, 3)
        assert s["par"].shape == (96, 96)
        assert s["joints"].shape == (16, 2)
        assert np.isfinite(s["image"]).all()
        # parsing labels restricted to valid ids + ignore
        assert set(np.unique(s["par"])).issubset(set(range(20)) | {255})


def test_lip_sample_slicing(lip_fixture):
    ds = LIPDataset(lip_fixture, "ims", "annos.json", "segs",
                    crop_size=(96, 96), sample=2)
    assert len(ds) == 2
    ds_inv = LIPDataset(lip_fixture, "ims", "annos.json", "segs",
                        crop_size=(96, 96), sample=2, inv_order=True)
    assert ds_inv.image_names() == ds.image_names()[-1:] + ["im2.jpg"]


def test_fast_lip_matches_reference_path_eval(lip_fixture):
    from npp_tpu.data import FastLIPDataset
    from npp_tpu.data import fast_aug

    if not fast_aug.is_available():
        pytest.skip("native library not built")
    ref = LIPDataset(lip_fixture, "ims", "annos.json", "segs",
                     crop_size=(96, 96), is_train=False, seed=0)
    fast = FastLIPDataset(lip_fixture, "ims", "annos.json", "segs",
                          crop_size=(96, 96), is_train=False, seed=0)
    for i in range(len(ref)):
        a, b = ref[i], fast[i]
        # Geometry must match exactly in eval mode (no rotation).
        np.testing.assert_allclose(b["joints"], a["joints"], atol=1e-2)
        np.testing.assert_allclose(b["crop_param"], a["crop_param"])
        np.testing.assert_allclose(b["scale"], a["scale"], rtol=1e-6)
        # Labels: nearest grids may differ at region borders only.
        agree = (a["par"] == b["par"]).mean()
        assert agree > 0.9, agree
        # Pixels: bilinear vs cubic interpolation tolerance.
        diff = np.abs(a["image"] - b["image"]).mean()
        assert diff < 0.2, diff


def test_fast_lip_train_mode_valid(lip_fixture):
    from npp_tpu.data import FastLIPDataset
    from npp_tpu.data import fast_aug

    if not fast_aug.is_available():
        pytest.skip("native library not built")
    ds = FastLIPDataset(lip_fixture, "ims", "annos.json", "segs",
                        crop_size=(96, 96), is_train=True, seed=1)
    s = ds[0]
    assert s["image"].shape == (96, 96, 3)
    assert np.isfinite(s["image"]).all()
    assert set(np.unique(s["par"])).issubset(set(range(20)) | {255})
    assert s["joints"].shape == (16, 2)
