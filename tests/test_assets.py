"""Reference data-asset pointers: split lists + PCKh GT CSV read in place."""
import numpy as np
import pytest

from npp_tpu.data import assets


pytestmark = pytest.mark.skipif(not assets.assets_available(),
                                reason="reference mount not present")


def test_val_split_list():
    rows = assets.load_split("val")
    assert len(rows) == 10000
    assert rows[0][0].startswith("val_images/")
    assert rows[0][1].startswith("val_segmentations/")


def test_train_split_list():
    rows = assets.load_split("train")
    assert len(rows) > 15000
    # train rows carry image, parsing, reversed-parsing, edge paths.
    assert len(rows[0]) == 4


def test_mini_split_matches_train_length():
    """The bi-level search zips train/mini batches 1:1
    (core/function.py:485-625); the vendored splits have equal length."""
    assert len(assets.load_split("mini")) == len(assets.load_split("train"))


def test_pose_gt_csv_parses_with_our_reader():
    from npp_tpu.utils import metrics as M

    gt, vis = M.read_pose_csv(assets.lip_pose_gt_csv(), has_vis_dim=True)
    assert gt.shape[1:] == (16, 2)
    assert gt.shape[0] > 9000
    assert vis.shape == gt.shape[:2]
    # nan joints were mapped to -1.
    assert (gt == -1).any()
    assert np.isfinite(gt).all()
