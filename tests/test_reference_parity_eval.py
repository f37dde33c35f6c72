"""Composed eval-engine parity: full validate pipeline vs the reference.

Round-2 VERDICT gap: per-piece oracle tests existed (decode, PCKh,
confusion matrix, losses) but nothing ran the COMPOSED pipeline —
flip-TTA forwards, channel-swap parsing fusion, heatmap resize + blur +
argmax decode, crop-param inverse mapping, CSV writing, PCKh against a
GT file, confusion-matrix mIoU — through BOTH engines on the SAME
converted weights and compared end products. This catches glue bugs none
of the unit tests can.

Reference engine: ``validate_sync`` (core/function.py:873-1081), run
as-is (barrier monkeypatched out for single process). Ours:
``core.evaluate.make_eval_step`` + ``validate``.

Tolerances: the nets carry converted IDENTICAL weights but are untrained,
so parsing argmax and heatmap peaks sit on near-ties where the two
frameworks' ~1e-3 fp32 forward noise can flip individual pixels/joints.
Comparisons are therefore statistical over 16 images (loss tight,
pixel/joint agreement thresholds, metric deltas small) rather than
bit-exact.
"""
import csv
import sys
from types import SimpleNamespace as NS

import numpy as np
import pytest

REFERENCE = "/root/reference"
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

torch = pytest.importorskip("torch")

if not torch.cuda.is_available():
    torch.Tensor.cuda = lambda self, *a, **k: self
# reference code predates numpy 1.24
if not hasattr(np, "int"):
    np.int = int  # noqa: NPY001
if not hasattr(np, "float"):
    np.float = float  # noqa: NPY001

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow

B, H, J, NCLS = 2, 64, 16, 20
N_BATCHES = 8
POSE_H = 16


def _make_eval_data(tmp, seed=0):
    rng = np.random.default_rng(seed)
    torch_batches, our_batches, names = [], [], []
    gt_rows = []
    n = 0
    for _ in range(N_BATCHES):
        img = rng.standard_normal((B, H, H, 3)).astype(np.float32)
        par = rng.integers(0, NCLS, (B, H, H)).astype(np.int64)
        par[rng.random((B, H, H)) < 0.05] = 255
        edge = rng.integers(0, 2, (B, H, H)).astype(np.int64)
        pose = rng.random((B, POSE_H, POSE_H, J + 1)).astype(np.float32)
        aux = rng.random((B, POSE_H, POSE_H, J + 1)).astype(np.float32)
        weight = np.ones((B, J, 1), np.float32)
        scale = rng.uniform(0.5, 1.5, (B,)).astype(np.float64)
        crop = np.zeros((B, 1, 8), np.float64)
        crop[:, 0, 0] = rng.integers(0, 20, B)   # crop start x
        crop[:, 0, 1] = rng.integers(0, 20, B)   # crop start y
        crop[:, 0, 2] = rng.integers(0, 10, B)   # store start x
        crop[:, 0, 3] = rng.integers(0, 10, B)   # store start y

        bnames = [f"img{n + i:03d}.jpg" for i in range(B)]
        names.extend(bnames)
        n += B
        for name in bnames:
            joints = rng.integers(0, 100, (16, 2))
            while np.all(joints[8] == joints[9]):  # nonzero head size
                joints[9] = rng.integers(0, 100, 2)
            vis = rng.integers(0, 2, 16)
            row = [name]
            for ji in range(16):  # GT format: name + 16x(x,y,vis)
                row += [str(joints[ji, 0]), str(joints[ji, 1]),
                        str(vis[ji])]
            gt_rows.append(row)

        meta = {"pose_weight": torch.from_numpy(weight),
                "scale": torch.from_numpy(scale),
                "crop_param": torch.from_numpy(crop)}
        torch_batches.append((
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
            [torch.from_numpy(par), torch.from_numpy(edge)],
            [torch.from_numpy(np.transpose(pose, (0, 3, 1, 2)).copy()),
             torch.from_numpy(np.transpose(aux, (0, 3, 1, 2)).copy())],
            meta))
        our_batches.append({
            "image": jnp.asarray(img),
            "par": jnp.asarray(par.astype(np.int32)),
            "edge": jnp.asarray(edge.astype(np.int32)),
            "pose": jnp.asarray(pose[..., :J]),
            "pose_aux": jnp.asarray(aux[..., :J]),
            "crop_param": jnp.asarray(crop.astype(np.float32)),
            "scale": jnp.asarray(scale.astype(np.float32)),
            "names": bnames,
        })
    gt_csv = str(tmp / "gt.csv")
    with open(gt_csv, "w", newline="") as f:
        w = csv.writer(f)
        for row in gt_rows:
            w.writerow(row)
    return torch_batches, our_batches, names, gt_csv


@pytest.fixture(scope="module")
def eval_pair(tmp_path_factory):
    jax.config.update("jax_default_matmul_precision", "highest")
    tmp = tmp_path_factory.mktemp("evalpair")
    from core.criterion import Criterion_par, Criterion_pose  # reference
    from core.function import validate_sync  # reference
    from models.model_augment import Network  # reference

    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.models.augment import NPPNet
    from npp_tpu.utils.torch_convert import convert_reference_state_dict

    cfg = NS(DATASET=NS(NUM_CLASSES=NCLS, NUM_JOINTS=J),
             TRAIN=NS(LAYERS=8, INIT_CHANNELS=8, IGNORE_LABEL=255),
             MODEL=NS(DECONV_WITH_BIAS=False, HEAD="", REFINE_LAYERS=1),
             PRINT_FREQ=10_000,
             POSE_PRED_PATH=str(tmp / "pose_pred.csv"),
             POSE_GT_PATH=None)
    torch.manual_seed(0)
    ref = Network(cfg).eval()
    sd = ref.state_dict()
    g = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
        elif k.endswith("running_var"):
            sd[k] = 1.0 + 0.1 * torch.rand(v.shape, generator=g)
    ref.load_state_dict(sd)

    torch_batches, our_batches, names, gt_csv = _make_eval_data(tmp)
    cfg.POSE_GT_PATH = gt_csv

    # single-process: barrier is unconditional in validate_sync
    orig_barrier = torch.distributed.barrier
    torch.distributed.barrier = lambda *a, **k: None
    try:
        criterion_pose = Criterion_pose(out_len=2, use_target_weight=False)
        criterion_par = Criterion_par(out_len=2)

        class _Writer:
            def add_scalar(self, *a, **k):
                pass

        writer_dict = {"writer": _Writer(), "valid_global_steps": 0}
        ref_loss, ref_miou, ref_iou_array, ref_pck = validate_sync(
            cfg, torch_batches, ref, names, criterion_pose, criterion_par,
            writer_dict, torch.device("cpu"))
    finally:
        torch.distributed.barrier = orig_barrier
    # validate_sync writes its merged CSV to POSE_PRED_PATH[:-6]+'0.csv'
    ref_pred_csv = cfg.POSE_PRED_PATH[:-6] + "0.csv"

    model = NPPNet(num_classes=NCLS, num_joints=J, layers=8,
                   init_channels=8, refine_layers=1, dtype=jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    converted, _ = convert_reference_state_dict(
        {k: v.numpy() for k, v in sd.items()}, dict(variables))
    params = {"model": converted["params"],
              "criterion": T.init_criterion_params(2)}
    step = E.make_eval_step(model, num_classes=NCLS,
                            class_weights=LIP_CLASS_WEIGHTS,
                            decode_hw=(H, H))
    our_pred_csv = str(tmp / "ours_pred.csv")
    ours = E.validate(step, params, converted["batch_stats"], our_batches,
                      num_classes=NCLS, gt_csv=gt_csv,
                      pred_csv=our_pred_csv, log_fn=lambda s: None)
    step_q = E.make_eval_step(model, num_classes=NCLS,
                              class_weights=LIP_CLASS_WEIGHTS,
                              decode_hw=(H, H), quantize="int8")
    ours_q = E.validate(step_q, params, converted["batch_stats"],
                        our_batches, num_classes=NCLS, gt_csv=gt_csv,
                        pred_csv=str(tmp / "ours_pred_int8.csv"),
                        log_fn=lambda s: None)
    return NS(ref_loss=ref_loss, ref_miou=ref_miou,
              ref_iou_array=np.asarray(ref_iou_array), ref_pck=ref_pck,
              ref_pred_csv=ref_pred_csv, our_pred_csv=our_pred_csv,
              ours=ours, ours_q=ours_q, n_images=len(names))


def test_composed_loss(eval_pair):
    p = eval_pair
    assert abs(p.ours["loss"] - p.ref_loss) / abs(p.ref_loss) < 2e-3, (
        p.ours["loss"], p.ref_loss)


def test_composed_parsing_metrics(eval_pair):
    """Confusion-matrix mIoU agrees up to argmax near-tie flips.

    Per-class IoU is NOT compared: with untrained weights the flip-fused
    logits are globally near-tied, so which single class "wins" most
    pixels differs between frameworks at the 1e-3 fp32 noise level (the
    per-piece confusion-matrix computation has its own exact oracle test
    in test_reference_parity.py; this composed check covers the summary
    metric)."""
    p = eval_pair
    assert abs(p.ours["mean_iou"] - p.ref_miou) < 1e-2, (
        p.ours["mean_iou"], p.ref_miou)
    # iou mass is comparable even when its class assignment flips
    assert abs(p.ours["iou_array"].sum() - p.ref_iou_array.sum()) < 0.1


def _read_csv(path):
    out = {}
    with open(path) as f:
        for row in csv.reader(f):
            out[row[0]] = np.array([float(v) for v in row[1:]]).reshape(
                16, 2)
    return out


def test_composed_decoded_poses(eval_pair):
    """Decoded joint positions from the two engines agree for most joints.

    Untrained heatmaps are smooth noise fields whose blurred global
    maxima sit on near-ties; the 1e-3 forward noise relocates a fraction
    of peaks (measured agreement 77% at 1.5px on this seed — decode math
    itself has an exact oracle test in test_reference_parity.py). The
    composed check asserts file protocol (names, LIP joint remap, row
    count) and majority agreement."""
    p = eval_pair
    ref_rows = _read_csv(p.ref_pred_csv)
    our_rows = _read_csv(p.our_pred_csv)
    assert set(ref_rows) == set(our_rows)
    assert len(ref_rows) == p.n_images
    total = agree = 0
    for name in ref_rows:
        d = np.abs(ref_rows[name] - our_rows[name]).max(axis=1)
        agree += int((d <= 1.5).sum())
        total += d.shape[0]
    assert agree / total > 0.6, (agree, total)


def test_composed_pckh(eval_pair):
    """End-of-pipeline PCKh averages agree within the joint-flip noise
    bound (each flipped joint moves the 256-joint average by ~0.4pt)."""
    p = eval_pair
    assert "pck_avg" in p.ours
    assert abs(p.ours["pck_avg"] - p.ref_pck) < 5.0, (
        p.ours["pck_avg"], p.ref_pck)


def test_composed_int8_eval_envelope(eval_pair):
    """The int8 serving mode run through the SAME composed eval on the
    converted weights lands inside a quantization-noise envelope of the
    fp32 run. Untrained logits are globally near-tied (worst case for
    argmax-derived metrics), so bounds are loose: the continuous loss
    must track closely, summary metrics must not be garbage."""
    p = eval_pair
    rel = abs(p.ours_q["loss"] - p.ours["loss"]) / abs(p.ours["loss"])
    assert rel < 5e-2, (p.ours_q["loss"], p.ours["loss"])
    assert abs(p.ours_q["mean_iou"] - p.ours["mean_iou"]) < 0.05, (
        p.ours_q["mean_iou"], p.ours["mean_iou"])
    assert abs(p.ours_q["pck_avg"] - p.ours["pck_avg"]) < 15.0, (
        p.ours_q["pck_avg"], p.ours["pck_avg"])


def test_multi_scale_inference_oracle(monkeypatch):
    """Composed multi-scale sliding-window parity: our one-program
    ``multi_scale_inference`` vs the reference
    ``BaseDataset.multi_scale_inference`` (dataset/base_dataset.py:182-244)
    on a shared linear stub model.

    Covers: per-scale long-side resize rounding, the small-image single
    window branch (scale 0.5 here), the tiled branch with CLIPPED tail
    windows (h1 = min(h0+crop, new_h)) and pad-pixel fill, flip-TTA
    logit averaging, the output->window bilinear upsample before exp,
    count normalization, and the cross-scale exp-logit sum. The
    reference class is bit-rotted (never subclassed; hard-codes CUDA
    devices), so the test patches torch.device / .cuda to run it on CPU.
    """
    import torch.nn as tnn
    from dataset.base_dataset import BaseDataset

    from npp_tpu.core.multiscale import multi_scale_inference
    from npp_tpu.ops.resize import resize_bilinear

    rng = np.random.default_rng(7)
    C = 5
    oh, ow = 61, 45           # odd sizes: rounding + clipped tails
    ch, cw = 32, 32
    scales = (0.5, 1.0, 1.3)
    mean = [0.485, 0.456, 0.406]
    std = [0.229, 0.224, 0.225]

    w = (rng.standard_normal((C, 3, 3, 3)) * 0.1).astype(np.float32)
    b = (rng.standard_normal((C,)) * 0.1).astype(np.float32)
    img = rng.standard_normal((1, oh, ow, 3)).astype(np.float32)

    class Stub(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(3, C, 3, stride=2, padding=1)
            with torch.no_grad():
                self.conv.weight.copy_(torch.from_numpy(w))
                self.conv.bias.copy_(torch.from_numpy(b))
            self.device_ids = [0]  # read by base_dataset.py:186

        def forward(self, x):
            return self.conv(x)

    monkeypatch.setattr(torch, "device", lambda *a, **k: "cpu")
    ds = BaseDataset(base_size=max(oh, ow), crop_size=(ch, cw),
                     mean=mean, std=std)
    ds.num_classes = C  # normally set by a (nonexistent) subclass
    t_img = torch.from_numpy(np.ascontiguousarray(
        img.transpose(0, 3, 1, 2)))
    with torch.no_grad():
        ref = ds.multi_scale_inference(Stub(), t_img, scales=list(scales),
                                       flip=True)
    ref = ref.numpy().transpose(0, 2, 3, 1)

    jw = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    jb = jnp.asarray(b)

    def apply_fn(params, tiles):
        kw, kb = params
        y = jax.lax.conv_general_dilated(
            tiles, kw, window_strides=(2, 2), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + kb
        # the reference upsamples each window's logits back to window
        # size before exp (base_dataset.py:167-169)
        return resize_bilinear(y, (ch, cw), align_corners=False)

    ours = multi_scale_inference(
        apply_fn, img, num_classes=C, params=(jw, jb),
        crop_size=(ch, cw), scales=scales, flip=True,
        pad_value=-np.array(mean, np.float32) / np.array(std, np.float32))

    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-4)
