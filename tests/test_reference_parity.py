"""Reference-oracle parity tests.

Every test in this module imports the ACTUAL reference implementation from
/root/reference (PyTorch/numpy) and golden-compares our TPU-native
re-implementations against it on random inputs. This is the credible
stand-in for the <=0.1pt metric-parity target while no LIP image data is
mounted: if any semantics drift (target rendering, OHEM, learned-lambda
losses, decode, PCKh protocol, confusion matrix), a test here fails.

The reference tree is treated as read-only public content; it is imported,
never copied.
"""
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

# Reference code predates numpy 1.24 (uses np.int) and calls .cuda() on a
# CPU-only box; shim both so the oracle runs unmodified.
if not hasattr(np, "int"):
    np.int = int  # noqa: NPY001
if not hasattr(np, "float"):
    np.float = float  # noqa: NPY001


@pytest.fixture(autouse=True)
def _cpu_cuda(monkeypatch):
    monkeypatch.setattr(torch.Tensor, "cuda",
                        lambda self, *a, **k: self, raising=False)


# ---------------------------------------------------------------------------
# Target generation (dataset/target_generation.py)
# ---------------------------------------------------------------------------

def test_gen_pose_target_parity():
    from dataset import target_generation as ref_tg

    from npp_tpu.data import targets as our_tg

    rng = np.random.default_rng(0)
    joints = rng.uniform(-20, 400, (16, 2))
    vis = rng.integers(0, 2, 16).astype(np.float64)
    ref_maps, ref_aux = ref_tg.gen_pose_target(
        joints, vis, stride=8, grid_x=46, grid_y=46, sigma=7, aux=True)
    our_maps, our_aux = our_tg.gen_pose_target(
        joints, vis, stride=8, grid_x=46, grid_y=46, sigma=7, aux=True)
    np.testing.assert_allclose(our_maps, ref_maps, atol=1e-6)
    np.testing.assert_allclose(our_aux, ref_aux, atol=1e-6)


def test_gen_pose_target_device_parity():
    from dataset import target_generation as ref_tg

    from npp_tpu.data import targets as our_tg

    rng = np.random.default_rng(1)
    joints = rng.uniform(0, 96, (2, 8, 2)).astype(np.float32)
    vis = rng.integers(0, 2, (2, 8)).astype(np.float32)
    ours, ours_aux = our_tg.gen_pose_target_device(
        joints, vis, stride=4, grid_x=24, grid_y=24, sigma=3, aux=True)
    ours = np.asarray(ours)
    for b in range(2):
        ref_maps, ref_aux = ref_tg.gen_pose_target(
            joints[b].astype(np.float64), vis[b], stride=4, grid_x=24,
            grid_y=24, sigma=3, aux=True)
        np.testing.assert_allclose(ours[b].transpose(2, 0, 1), ref_maps,
                                   atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ours_aux)[b].transpose(2, 0, 1), ref_aux, atol=1e-5)


def test_generate_edge_parity():
    from dataset import target_generation as ref_tg

    from npp_tpu.data import targets as our_tg

    rng = np.random.default_rng(2)
    label = rng.integers(0, 5, (48, 48)).astype(np.uint8)
    label[rng.random((48, 48)) < 0.05] = 255
    for width in (3, 5):
        ref_edge = ref_tg.generate_edge(label, edge_width=width)
        our_edge = our_tg.generate_edge(label, edge_width=width)
        np.testing.assert_array_equal(our_edge, ref_edge)
        dev = np.asarray(our_tg.generate_edge_device(
            label[None].astype(np.int32), edge_width=width))[0]
        np.testing.assert_array_equal(dev, ref_edge)


def test_gen_parsing_target_parity():
    import cv2

    from dataset import target_generation as ref_tg

    from npp_tpu.data import targets as our_tg

    rng = np.random.default_rng(3)
    anno = rng.integers(0, 20, (60, 52)).astype(np.uint8)
    mat = cv2.getRotationMatrix2D((30.0, 26.0), 17.0, 1.0)
    rotate_param = (mat, 64, 72)
    crop = np.array([[3, 4, 0, 0, 27, 28, 24, 24]], dtype=np.int64)
    crop_param = (crop, 32, 32)
    for flip in (False, True):
        ref_out = ref_tg.gen_parsing_target(
            anno, scale_param=1.3, rotate_param=rotate_param,
            crop_param=crop_param, flip_param=flip, stride=8)
        our_out = our_tg.gen_parsing_target(
            anno, scale_param=1.3, rotate_param=rotate_param,
            crop_param=crop_param, flip_param=flip, stride=8)
        np.testing.assert_array_equal(our_out, ref_out)


# ---------------------------------------------------------------------------
# Losses (core/criterion.py)
# ---------------------------------------------------------------------------

def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())


def test_ohem_cross_entropy_parity():
    from core.criterion import OhemCrossEntropy, weights_lip

    from npp_tpu.core import criterion as our_crit

    rng = np.random.default_rng(4)
    logits = rng.standard_normal((2, 24, 24, 20)).astype(np.float32) * 3
    target = rng.integers(0, 20, (2, 24, 24))
    target[rng.random((2, 24, 24)) < 0.1] = 255
    for min_kept in (200, 131072):
        ref = OhemCrossEntropy(ignore_index=255, thres=0.9,
                               min_kept=min_kept, weight=weights_lip)
        ref_loss = ref(_nchw(logits), torch.from_numpy(target)).item()
        our_loss = float(our_crit.ohem_cross_entropy(
            logits, target, our_crit.LIP_CLASS_WEIGHTS, ignore_index=255,
            thres=0.9, min_kept=min_kept))
        assert our_loss == pytest.approx(ref_loss, rel=1e-4), min_kept


def test_criterion_pose_parity():
    from core.criterion import Criterion_pose

    from npp_tpu.core import criterion as our_crit

    rng = np.random.default_rng(5)
    stages = []
    for _ in range(2):
        pose = rng.random((2, 16, 16, 16)).astype(np.float32)
        aux = rng.random((2, 8, 8, 16)).astype(np.float32)  # resize path
        stages.append((pose, aux))
    target = rng.random((2, 16, 16, 16)).astype(np.float32)
    target_aux = rng.random((2, 16, 16, 16)).astype(np.float32)

    ref = Criterion_pose(out_len=2, use_target_weight=False)
    ref_loss = ref([[_nchw(p), _nchw(a)] for p, a in stages],
                   [torch.from_numpy(np.transpose(target, (0, 3, 1, 2))),
                    torch.from_numpy(np.transpose(target_aux,
                                                  (0, 3, 1, 2)))]).item()
    lam = our_crit.init_pose_lamda(2)
    our_loss = float(our_crit.pose_loss(stages, target, target_aux, lam))
    assert our_loss == pytest.approx(ref_loss, rel=1e-4)


def test_criterion_par_parity():
    from core.criterion import Criterion_par

    from npp_tpu.core import criterion as our_crit

    rng = np.random.default_rng(6)
    stages = []
    for _ in range(2):
        par = rng.standard_normal((2, 12, 12, 20)).astype(np.float32)
        edge = rng.standard_normal((2, 12, 12, 2)).astype(np.float32)
        stages.append((par, edge))
    target_par = rng.integers(0, 20, (2, 24, 24))
    target_par[rng.random((2, 24, 24)) < 0.05] = 255
    target_edge = rng.integers(0, 2, (2, 24, 24))

    ref = Criterion_par(out_len=2, ignore_index=255, thres=0.9, min_kept=300)
    ref_loss = ref([[_nchw(p), _nchw(e)] for p, e in stages],
                   [torch.from_numpy(target_par),
                    torch.from_numpy(target_edge)]).item()
    lam = our_crit.init_par_lamda(2)
    our_loss = float(our_crit.parsing_loss(
        stages, target_par, target_edge, lam,
        class_weights=our_crit.LIP_CLASS_WEIGHTS, ignore_index=255,
        thres=0.9, min_kept=300))
    assert our_loss == pytest.approx(ref_loss, rel=1e-4)


# ---------------------------------------------------------------------------
# Heatmap decode (core/inference.py) + affine transforms (utils/transforms)
# ---------------------------------------------------------------------------

def test_get_final_preds_parity():
    from types import SimpleNamespace

    from core import inference as ref_inf

    from npp_tpu.utils import transforms as our_tr

    rng = np.random.default_rng(7)
    hm = rng.random((3, 16, 24, 24)).astype(np.float32)
    center = rng.uniform(100, 200, (3, 2)).astype(np.float32)
    scale = rng.uniform(0.8, 1.5, (3, 2)).astype(np.float32)
    cfg = SimpleNamespace(TEST=SimpleNamespace(POST_PROCESS=True))
    ref_preds, ref_maxvals = ref_inf.get_final_preds(cfg, hm.copy(), center,
                                                     scale)
    our_preds, our_maxvals = our_tr.get_final_preds(hm.copy(), center, scale,
                                                    post_process=True)
    np.testing.assert_allclose(our_preds, ref_preds, atol=1e-5)
    np.testing.assert_allclose(our_maxvals, ref_maxvals, atol=1e-6)


def test_device_decode_matches_reference_components():
    """Our on-device get_max_preds + quarter offset vs the reference's
    numpy pipeline (core/inference.py:18-65)."""
    from types import SimpleNamespace

    from core import inference as ref_inf

    from npp_tpu.core import inference as our_inf

    rng = np.random.default_rng(8)
    hm = rng.random((2, 20, 20, 12)).astype(np.float32)
    hm_nchw = np.transpose(hm, (0, 3, 1, 2)).copy()
    ref_coords, ref_maxvals = ref_inf.get_max_preds(hm_nchw)
    our_coords, our_maxvals = our_inf.get_max_preds(hm)
    np.testing.assert_allclose(np.asarray(our_coords), ref_coords)
    np.testing.assert_allclose(np.asarray(our_maxvals)[..., 0],
                               ref_maxvals[..., 0])
    # Quarter offset: reference applies it inside get_final_preds before the
    # affine transform; isolate by using an identity-free comparison of the
    # offset coords (center/scale handled in test_get_final_preds_parity).
    cfg = SimpleNamespace(TEST=SimpleNamespace(POST_PROCESS=True))
    center = np.tile(np.array([10.0, 10.0], np.float32), (2, 1))
    scale = np.full((2, 2), 20 / 200.0, np.float32)  # identity-ish affine
    ref_final, _ = ref_inf.get_final_preds(cfg, hm_nchw, center, scale)
    ours_off = np.asarray(our_inf.post_process_quarter_offset(our_coords, hm))
    # transform_preds with scale*200 == heatmap size maps x -> x + 0.5*t - c
    # exactly; undo that shift to compare the offset step itself.
    shift = (center - np.array([10.0, 10.0]))[:, None, :]
    np.testing.assert_allclose(ours_off, ref_final + shift, atol=1e-4)


def test_gaussian_blur_matches_scipy():
    """validate_sync smooths heatmaps with scipy gaussian_filter(sigma=3)
    (core/function.py:982); our separable-conv blur must match it."""
    from scipy.ndimage import gaussian_filter

    from npp_tpu.core.inference import gaussian_blur

    rng = np.random.default_rng(9)
    hm = rng.random((40, 40)).astype(np.float32)
    ref = gaussian_filter(hm, sigma=3)
    ours = np.asarray(gaussian_blur(hm[None, :, :, None], 3.0))[0, :, :, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_flip_back_and_fliplr_joints_parity():
    from utils import transforms as ref_tr

    from npp_tpu.utils import transforms as our_tr

    rng = np.random.default_rng(10)
    out = rng.random((2, 6, 8, 8)).astype(np.float32)
    pairs = ((0, 3), (1, 4))
    np.testing.assert_allclose(our_tr.flip_back(out.copy(), pairs),
                               ref_tr.flip_back(out.copy(), pairs))
    joints = rng.uniform(0, 64, (6, 2))
    vis = np.ones((6, 2))
    rj, rv = ref_tr.fliplr_joints(joints.copy(), vis.copy(), 64, pairs)
    oj, ov = our_tr.fliplr_joints(joints.copy(), vis.copy(), 64, pairs)
    np.testing.assert_allclose(oj, rj)
    np.testing.assert_allclose(ov, rv)


# ---------------------------------------------------------------------------
# Metrics (utils/utils.py, utils/calc_pckh.py)
# ---------------------------------------------------------------------------

def test_confusion_matrix_parity():
    from utils.utils import get_confusion_matrix

    from npp_tpu.utils.metrics import confusion_matrix

    rng = np.random.default_rng(11)
    label = rng.integers(0, 7, (2, 16, 16))
    label[rng.random((2, 16, 16)) < 0.1] = 255
    logits = rng.standard_normal((2, 7, 16, 16)).astype(np.float32)
    ref_cm = get_confusion_matrix(torch.from_numpy(label),
                                  torch.from_numpy(logits),
                                  size=(16, 16), num_class=7, ignore=255)
    pred = np.argmax(logits, axis=1)
    our_cm = np.asarray(confusion_matrix(label, pred, num_classes=7,
                                         ignore=255))
    np.testing.assert_array_equal(our_cm, ref_cm)


def test_compute_pck_parity():
    from utils import calc_pckh as ref_pck

    from npp_tpu.utils import metrics as our_m

    rng = np.random.default_rng(12)
    gt = rng.uniform(0, 300, (40, 16, 2))
    gt[rng.random((40, 16)) < 0.15] = -1
    pred = gt + rng.normal(0, 12, gt.shape)
    ref_dist = ref_pck.get_head_size(gt)
    our_head = our_m.get_head_size(gt)
    np.testing.assert_allclose(our_head, ref_dist)
    rd = ref_pck.get_norm_dist(pred, gt, ref_dist)
    od = our_m.norm_dist(pred, gt, ref_dist)
    np.testing.assert_allclose(od, rd)
    rp = ref_pck.compute_pck(rd, np.array([0.5]))
    op = our_m.compute_pck(od, (0.5,))
    np.testing.assert_allclose(op, rp)


def test_pckh_csv_protocol_against_reference_gt(tmp_path):
    """End-to-end CSV protocol vs the reference's REAL LIP ground-truth
    file: write predictions with our writer (incl. the internal->LIP joint
    remap), evaluate with BOTH the reference's calc_pck_lip_dataset and our
    calc_pck_lip, and require identical PCKh tables."""
    from utils import calc_pckh as ref_pck

    from npp_tpu.utils import metrics as our_m

    gt_path = f"{REFERENCE}/prepare_files/pose_csv/pose_gt.csv"
    n = 500
    gt, _ = our_m.read_pose_csv(gt_path, has_vis_dim=True)
    gt = gt[:n]

    # Synthetic predictions: GT + noise, in LIP CSV joint order. Build the
    # internal-order array that save_pose_csv will remap back to LIP order.
    rng = np.random.default_rng(13)
    pred_lip = np.where(gt < 0, 1.0, gt + rng.normal(0, 9, gt.shape))
    pred_lip = np.maximum(np.rint(pred_lip), 0)
    internal = np.zeros_like(pred_lip)
    for k, j in enumerate(our_m.IDX_MAP_TO_LIP):
        internal[:, j] = pred_lip[:, k]
    names = [f"im_{i}.jpg" for i in range(n)]
    pred_path = str(tmp_path / "pose_pred.csv")
    our_m.save_pose_csv(names, internal, pred_path)

    ref_table = ref_pck.calc_pck_lip_dataset(gt_path, pred_path,
                                             eval_num=n)
    our_table = our_m.calc_pck_lip(gt_path, pred_path, eval_num=n)
    np.testing.assert_allclose(np.asarray(our_table),
                               np.asarray(ref_table), atol=1e-9)
    assert 30 < our_table[0, -1] < 100  # sanity: noise keeps PCKh sane


def test_heatmap_pck_accuracy_parity():
    from core.evaluate import accuracy as ref_accuracy

    from npp_tpu.utils.metrics import heatmap_pck_accuracy

    rng = np.random.default_rng(14)
    out = rng.random((4, 10, 24, 24)).astype(np.float32)
    tgt = rng.random((4, 10, 24, 24)).astype(np.float32)
    r_acc, r_avg, r_cnt, _ = ref_accuracy(out, tgt)
    o_acc, o_avg, o_cnt, _ = heatmap_pck_accuracy(out, tgt)
    np.testing.assert_allclose(o_acc, r_acc)
    assert o_avg == pytest.approx(r_avg)
    assert o_cnt == r_cnt
