"""Metric stack tests (confusion matrix, mIoU, PCKh, heatmap PCK, OKS)."""
import numpy as np

import jax.numpy as jnp

from npp_tpu.utils import metrics as M


def test_confusion_matrix_counts():
    label = np.array([[[0, 1], [2, 255]]], np.int32)
    pred = np.array([[[0, 1], [1, 0]]], np.int32)
    cm = np.asarray(M.confusion_matrix(jnp.asarray(label), jnp.asarray(pred),
                                       3, ignore=255))
    expected = np.zeros((3, 3))
    expected[0, 0] = 1
    expected[1, 1] = 1
    expected[2, 1] = 1
    np.testing.assert_array_equal(cm, expected)


def test_seg_metrics_perfect_prediction():
    rng = np.random.default_rng(0)
    label = rng.integers(0, 5, (2, 16, 16)).astype(np.int32)
    cm = np.asarray(M.confusion_matrix(jnp.asarray(label),
                                       jnp.asarray(label), 5))
    m = M.seg_metrics(cm)
    assert m["pixel_acc"] == 1.0
    assert m["mean_iou"] == 1.0


def test_pckh_exact_predictions_give_100():
    rng = np.random.default_rng(1)
    gt = rng.uniform(10, 100, (8, 16, 2))
    pck = M.pckh_from_arrays(gt.copy(), gt)
    assert np.allclose(pck[-1][-1], 100.0)


def test_pckh_head_normalization():
    # One sample; joints 8/9 define head size 10; a prediction off by 4
    # (0.4 * head) is within PCKh@0.5, one off by 6 is not.
    gt = np.zeros((1, 16, 2)) + 50.0
    gt[0, 8] = [50, 50]
    gt[0, 9] = [50, 60]
    pred = gt.copy()
    pred[0, 0, 0] += 4.0
    pred[0, 1, 0] += 6.0
    pck = M.pckh_from_arrays(pred, gt)
    row = pck[-1]
    assert row[0] == 100.0
    assert row[1] == 0.0


def test_heatmap_pck_accuracy_perfect():
    rng = np.random.default_rng(2)
    hm = rng.random((2, 4, 32, 32)).astype(np.float32)
    acc, avg, cnt, _ = M.heatmap_pck_accuracy(hm, hm)
    assert avg == 1.0


def test_oks_perfect_prediction():
    gt = np.concatenate([np.random.default_rng(3).uniform(10, 50, (14, 2)),
                         np.ones((14, 1))], axis=1)
    box = np.array([[0.0, 0.0, 60.0, 60.0]])
    pred = gt[:, :2].copy()  # predictions are box-relative (box at origin)
    oks = M.cal_oks(gt, pred, box)
    assert oks == 1.0


def test_oks_map_perfect():
    rng = np.random.default_rng(4)
    gt_joints = [np.concatenate([rng.uniform(10, 50, (14, 2)),
                                 np.ones((14, 1))], axis=1)]
    boxes = [np.array([[0.0, 0.0, 60.0, 60.0]])]
    preds = {"im1": [gt_joints[0][:, :2].copy()]}
    gts = {"im1": (gt_joints, boxes)}
    ap = M.oks_map(preds, gts)
    assert np.allclose(ap[-1], 1.0)


def test_save_and_read_pose_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    pose = rng.integers(0, 300, (3, 16, 2)).astype(np.float64)
    path = str(tmp_path / "pred.csv")
    M.save_pose_csv(["a.jpg", "b.jpg", "c.jpg"], pose, path)
    data, vis = M.read_pose_csv(path, has_vis_dim=False)
    assert data.shape == (3, 16, 2)
    # Round-trip applies the internal->LIP joint remap.
    np.testing.assert_array_equal(data[0, 0], pose[0, M.IDX_MAP_TO_LIP[0]])
