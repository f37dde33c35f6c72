"""Pascal-Person-Part data-path tests against the reference oracle.

Round-2 VERDICT gap #3: ``npp_tpu/data/pascal.py`` compiled but had never
run. This module synthesizes a tiny on-disk PPP fixture (pose ``.mat``
annos, Mask-R-CNN-style ``.npy`` instance predictions, parsing PNGs,
JPEGs, split list) and proves:

1. ``build_ppp_db`` reproduces the reference ``PPPDataset.get_db``
   Hungarian matching exactly (dataset/pascal.py:125-168 as oracle);
2. our eval-mode ``__getitem__`` equals the reference's (the eval chain is
   deterministic: fixed scale, centered crop, no flip) — image, parsing
   target, joints, visibility, edge, and rendered pose maps;
3. the train-mode path produces well-formed samples;
4. a ``validate_ppp`` batch runs end-to-end through loader + eval step.

The reference hard-codes ``crop_size=384`` inside ``augmentation_scale``
(data_augmentation.py:8: PPP's ``__getitem__`` never forwards its own
crop size), so the parity comparison runs at the released 384x384 config.
"""
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")
scio = pytest.importorskip("scipy.io")

# The reference module imports torchvision (unused at runtime for the db /
# eval paths) which isn't installed here; stub it before import.
for name in ("torchvision", "torchvision.transforms",
             "torchvision.datasets"):
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)

H0, W0 = 120, 100


@pytest.fixture(scope="module")
def ppp_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ppp")
    for d in ("images", "pose_annos", "parsing_annos", "masks"):
        (root / d).mkdir()
    rng = np.random.default_rng(0)

    def person_box(x1, y1, x2, y2):
        return np.array([[x1, y1, x2, y2]], np.float64)

    def person_joints(box, vis_pattern):
        j = np.zeros((14, 3))
        j[:, 0] = rng.uniform(box[0, 0] + 2, box[0, 2] - 2, 14)
        j[:, 1] = rng.uniform(box[0, 1] + 2, box[0, 3] - 2, 14)
        j[:, 2] = vis_pattern
        return j

    # img1: 3 GT persons, 3 predicted instances (one non-person class).
    # GT C has no overlapping prediction -> cost 1 > 0.3 -> dropped.
    gt_boxes = [person_box(10, 12, 60, 100), person_box(40, 10, 95, 110),
                person_box(0, 0, 8, 8)]
    boxes_cell = np.empty((1, 3), object)
    joints_cell = np.empty((1, 3), object)
    for i, b in enumerate(gt_boxes):
        boxes_cell[0, i] = b
        joints_cell[0, i] = person_joints(
            b, rng.integers(0, 3, 14).astype(np.float64))
    scio.savemat(str(root / "pose_annos" / "img1.mat"),
                 {"boxes": boxes_cell, "joints": joints_cell})

    pred_boxes = np.array([
        [38.0, 11.0, 93.0, 108.0],   # ~GT B
        [0.0, 0.0, 50.0, 50.0],      # class 15: filtered
        [11.0, 13.0, 58.0, 98.0],    # ~GT A
    ])
    pred_masks = np.zeros((3, H0, W0), np.uint8)
    for n, b in enumerate(pred_boxes):
        pred_masks[n, int(b[1]):int(b[3]), int(b[0]):int(b[2])] = 1
    np.save(str(root / "masks" / "img1.npy"),
            {"pred_classes": np.array([0, 15, 0]),
             "boxes": pred_boxes, "pred_masks": pred_masks})

    # img2: masks but no pose .mat -> must be skipped by both builders.
    np.save(str(root / "masks" / "img2.npy"),
            {"pred_classes": np.array([0]),
             "boxes": pred_boxes[:1], "pred_masks": pred_masks[:1]})

    for name in ("img1", "img2"):
        im = rng.integers(0, 255, (H0, W0, 3)).astype(np.uint8)
        cv2.imwrite(str(root / "images" / (name + ".jpg")), im)
        par = rng.integers(0, 7, (H0, W0)).astype(np.uint8)
        cv2.imwrite(str(root / "parsing_annos" / (name + ".png")), par)

    (root / "list.txt").write_text("img1\nimg2\n")
    return root


def _ref_dataset(root, is_train=False):
    from dataset.pascal import PPPDataset as RefPPP  # reference

    return RefPPP(root=str(root), im_root="images",
                  im_list_path="list.txt", pose_anno_path="pose_annos",
                  parsing_anno_path="parsing_annos", mask_path="masks",
                  crop_size=(384, 384), sigma=7, pose_net_stride=4,
                  pose_aux=False, is_train=is_train, flip_prob=0.5)


def _our_dataset(root, is_train=False, crop=384):
    from npp_tpu.data.pascal import PPPDataset

    return PPPDataset(root=str(root), im_root="images",
                      im_list_path="list.txt", pose_anno_path="pose_annos",
                      parsing_anno_path="parsing_annos", mask_path="masks",
                      crop_size=(crop, crop), sigma=7, pose_net_stride=4,
                      is_train=is_train, seed=0)


def test_build_ppp_db_matches_reference(ppp_root):
    ref = _ref_dataset(ppp_root)
    ours = _our_dataset(ppp_root)
    assert len(ours.db) == len(ref.db) == 2
    for a, b in zip(ours.db, ref.db):
        assert a["im_name"] == b["im_name"]
        np.testing.assert_array_equal(a["box"], b["box"])
        np.testing.assert_array_equal(a["joint"], b["joint"])
        np.testing.assert_array_equal(a["mask"], b["mask"])


def test_eval_getitem_matches_reference(ppp_root):
    from npp_tpu.data import targets as tg
    from npp_tpu.data.lip import normalize_image

    ref = _ref_dataset(ppp_root, is_train=False)
    ours = _our_dataset(ppp_root, is_train=False)
    for idx in range(2):
        ref_im, ref_par, ref_pose, meta = ref[idx]
        s = ours[idx]
        np.testing.assert_allclose(s["image"],
                                   normalize_image(np.asarray(ref_im)),
                                   atol=1e-6)
        np.testing.assert_array_equal(s["par"], ref_par[0].numpy())
        np.testing.assert_allclose(s["joints"], meta["joints"], atol=1e-9)
        np.testing.assert_array_equal(s["visibility"],
                                      meta["visiable"].astype(np.float32))
        # edge: reference masks ignore pixels after the (identity) resize
        our_edge = tg.generate_edge(s["par"])
        our_edge[s["par"] == 255] = 255
        np.testing.assert_array_equal(our_edge, ref_par[1].numpy())
        # pose maps from the (already equal) joints through our renderer
        maps, _ = tg.gen_pose_target(s["joints"], s["visibility"],
                                     stride=4, grid_x=96, grid_y=96,
                                     sigma=7, aux=False)
        np.testing.assert_allclose(maps, ref_pose.numpy(), atol=1e-5)


def test_train_getitem_well_formed(ppp_root):
    ours = _our_dataset(ppp_root, is_train=True, crop=64)
    for idx in range(len(ours)):
        s = ours[idx]
        assert s["image"].shape == (64, 64, 3)
        assert s["par"].shape == (64, 64)
        assert s["joints"].shape == (14, 2)
        assert s["visibility"].shape == (14,)
        assert set(np.unique(s["par"])) <= set(range(7)) | {255}


def test_validate_ppp_batch(ppp_root, tiny_model_bundle):
    """One real batch from the fixture through the full PPP eval path."""
    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import PASCAL_CLASS_WEIGHTS
    from npp_tpu.data import DataLoader, make_target_renderer

    model, variables, _ = tiny_model_bundle
    ds = _our_dataset(ppp_root, is_train=False, crop=64)
    renderer = make_target_renderer(stride=4, sigma=3, num_joints=14)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        drop_last=False, renderer=renderer)
    params = {"model": variables["params"],
              "criterion": T.init_criterion_params(2)}
    step = E.make_ppp_eval_step(model, num_classes=7,
                                class_weights=PASCAL_CLASS_WEIGHTS,
                                ohem_keep=100)
    result = E.validate_ppp(step, params, variables["batch_stats"], loader,
                            num_classes=7, num_joints=14, log_fn=lambda s: None)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["mean_iou"] <= 1.0
    assert result["pck"].shape == (15,)
