"""Eval engine test: full validate pass over synthetic data."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.core import evaluate as E
from npp_tpu.core import train as T
from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
from npp_tpu.data import DataLoader, SyntheticDataset, make_target_renderer


def test_validate_runs(tiny_model_bundle):
    model, variables, _ = tiny_model_bundle
    params = {"model": variables["params"],
              "criterion": T.init_criterion_params(2)}
    ds = SyntheticDataset(length=4, crop_size=(64, 64), num_joints=14,
                          num_classes=7, is_train=False)
    renderer = make_target_renderer(stride=4, sigma=3, num_joints=14)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        renderer=renderer)
    step = E.make_eval_step(model, num_classes=7,
                            class_weights=LIP_CLASS_WEIGHTS[:7],
                            flip_test=True, ohem_keep=512,
                            flip_pairs=((1, 2),), decode_hw=(64, 64))
    result = E.validate(step, params, variables["batch_stats"], loader,
                        num_classes=7)
    assert np.isfinite(result["loss"])
    assert 0.0 <= result["mean_iou"] <= 1.0
    assert result["pose_preds"].shape == (4, 14, 3)
    assert len(result["names"]) == 4
    assert 0.0 <= result["pixel_acc"] <= 1.0
    # Confusion matrix counted every non-ignore pixel of every image.
    total_px = 4 * 64 * 64
    cm_total = result["iou_array"]  # sanity: shapes only
    assert cm_total.shape == (7,)


def test_validate_ppp_runs(tiny_model_bundle):
    model, variables, _ = tiny_model_bundle
    params = {"model": variables["params"],
              "criterion": T.init_criterion_params(2)}
    ds = SyntheticDataset(length=2, crop_size=(64, 64), num_joints=14,
                          num_classes=7, is_train=False, seed=3)
    renderer = make_target_renderer(stride=4, sigma=3, num_joints=14)
    loader = DataLoader(ds, batch_size=2, shuffle=False, num_workers=1,
                        renderer=renderer)
    step = E.make_ppp_eval_step(model, num_classes=7,
                                class_weights=LIP_CLASS_WEIGHTS[:7],
                                flip_test=True, ohem_keep=512)
    logs = []
    result = E.validate_ppp(step, params, variables["batch_stats"], loader,
                            num_classes=7, num_joints=14,
                            log_fn=logs.append)
    assert np.isfinite(result["loss"])
    assert result["pck"].shape == (15,)
    assert 0 <= result["pck_avg"] <= 100
    assert "PCK@0.5" in logs[0]


def test_predictor_single_image(tiny_model_bundle):
    from npp_tpu.core.predictor import Predictor

    model, variables, _ = tiny_model_bundle
    pred = Predictor(model, variables, crop_size=(64, 64),
                     flip_pairs=((1, 2),))
    im = np.random.default_rng(5).integers(0, 255, (100, 80, 3)).astype(
        np.uint8)
    out = pred(im)
    assert out["parsing"].shape == (100, 80)
    assert out["parsing_crop"].shape == (64, 64)
    assert out["keypoints"].shape == (14, 3)
    assert np.isfinite(out["keypoints"]).all()
    assert out["parsing"].max() < 7

    # DARK sub-pixel decode: same parsing, keypoints within 1 px (the
    # refinement only shifts peaks sub-pixel; peak scores unchanged).
    dark = Predictor(model, variables, crop_size=(64, 64),
                     flip_pairs=((1, 2),), dark_decode=True)(im)
    # Separately compiled program: argmax parsing can flip near-tie
    # pixels under ~1-ulp fusion differences — fraction-match.
    agree = np.mean(dark["parsing"] == out["parsing"])
    assert agree > 0.999, agree
    # sub-pixel offsets are <1 heatmap px; the inverse crop map divides
    # by scale (0.64 here), so allow <1/scale in original coords.
    assert np.abs(dark["keypoints"][:, :2]
                  - out["keypoints"][:, :2]).max() < 1.6
    np.testing.assert_allclose(dark["keypoints"][:, 2],
                               out["keypoints"][:, 2], rtol=1e-6)


def test_predictor_batch_padding_is_invisible(tiny_model_bundle):
    """predict_batch pads the device batch to a multiple of 8 (MXU tile
    packing, BENCH.md batch-size profile); results for the real rows must
    be bit-identical to an unpadded batch of the same shape (eval-mode BN
    has no cross-sample coupling)."""
    from npp_tpu.core.predictor import Predictor

    model, variables, _ = tiny_model_bundle
    pred = Predictor(model, variables, crop_size=(64, 64),
                     flip_pairs=((1, 2),))
    rng = np.random.default_rng(7)
    ims = [rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
           for h, w in ((100, 80), (64, 64), (50, 90))]
    # 3 images -> padded to 8 internally.
    outs = pred.predict_batch(ims)
    assert len(outs) == 3
    # The same images in an exactly-8 batch (no padding needed): the
    # first three rows run through the identical program.
    full = pred.predict_batch(ims + [ims[0], ims[1], ims[2], ims[0],
                                     ims[1]])
    for a, b, im in zip(outs, full[:3], ims):
        assert a["parsing"].shape == im.shape[:2]
        np.testing.assert_array_equal(a["parsing"], b["parsing"])
        np.testing.assert_array_equal(a["keypoints"], b["keypoints"])


@pytest.mark.slow
def test_predictor_stream_matches_batch(tiny_model_bundle):
    """predict_stream (prefetch-threaded serving loop) must yield the
    same results in the same order as predict_batch."""
    from npp_tpu.core.predictor import Predictor

    model, variables, _ = tiny_model_bundle
    pred = Predictor(model, variables, crop_size=(64, 64),
                     flip_pairs=((1, 2),))
    rng = np.random.default_rng(11)
    # 6 images / batch_size 2: every chunk (and the direct call) pads to
    # the same bs-8 program, so results must be bit-identical.
    ims = [rng.integers(0, 255, (60 + 4 * i, 70, 3)).astype(np.uint8)
           for i in range(6)]
    streamed = list(pred.predict_stream(iter(ims), batch_size=2))
    direct = pred.predict_batch(ims)
    assert len(streamed) == 6
    for s, d in zip(streamed, direct):
        np.testing.assert_array_equal(s["parsing"], d["parsing"])
        np.testing.assert_array_equal(s["keypoints"], d["keypoints"])


@pytest.mark.slow
def test_predictor_pose_scales(tiny_model_bundle):
    """Scale-list pose TTA (Predictor(pose_scales=...)): one batched
    forward over all scale crops; parsing comes from the base scale (so
    it matches the single-scale predictor), keypoints decode in-bounds.
    The working version of the reference's bit-rotted multi-scale pose
    tester (utils/eval_util.py:82-268)."""
    import pytest

    from npp_tpu.core.predictor import Predictor

    model, variables, _ = tiny_model_bundle
    rng = np.random.default_rng(11)
    ims = [rng.integers(0, 255, (100, 80, 3)).astype(np.uint8),
           rng.integers(0, 255, (64, 90, 3)).astype(np.uint8)]
    single = Predictor(model, variables, crop_size=(64, 64),
                       flip_pairs=((1, 2),))
    ms = Predictor(model, variables, crop_size=(64, 64),
                   flip_pairs=((1, 2),), pose_scales=(0.75, 1.0, 1.25))
    outs_s = single.predict_batch(ims)
    outs_m = ms.predict_batch(ims)
    for o_s, o_m, im in zip(outs_s, outs_m, ims):
        # Base-scale parsing through a separately compiled program:
        # near-tie argmax pixels may flip under fusion reassociation.
        agree = np.mean(o_s["parsing"] == o_m["parsing"])
        assert agree > 0.999, agree
        kp = o_m["keypoints"]
        assert kp.shape == o_s["keypoints"].shape
        assert np.isfinite(kp).all()
        # Peaks live anywhere on the BASE canvas (untrained model: also
        # in its padding), so decoded coords span the canvas back-
        # projection, not the image bounds.
        _, cp, s = ms.preprocess(im)
        lo = (np.array([0.0, 0.0]) + cp[0, :2] - cp[0, 2:4]) / s
        hi = (np.array([63.0, 63.0]) + cp[0, :2] - cp[0, 2:4]) / s
        assert (kp[:, :2] >= lo - 1).all() and (kp[:, :2] <= hi + 1).all()

    with pytest.raises(ValueError, match="must contain"):
        Predictor(model, variables, crop_size=(64, 64),
                  pose_scales=(0.8, 1.2))
