"""Evaluation metrics: confusion matrix / mIoU, PCKh@0.5, heatmap PCK, OKS mAP.

TPU-native re-implementation of the reference metric stack:
- confusion matrix via on-device scatter-add (utils/utils.py:192-218's
  bincount trick, but jit-able and collective-friendly);
- mIoU / pixel acc / per-class tables (core/function.py:1022-1079,
  utils/calc_miou.py:36-91);
- PCKh@0.5 with the LIP head-size normalization and CSV protocol
  (utils/calc_pckh.py);
- heatmap-space PCK (core/evaluate.py:43-99);
- OKS mAP for Pascal-Person-Part pose (core/mAP.py:8-76).
"""
from __future__ import annotations

import csv
import functools

import jax
import jax.numpy as jnp
import numpy as np

LIP_CLASS_NAMES = (
    "background", "hat", "hair", "glove", "sunglasses", "upperclothes",
    "dress", "coat", "socks", "pants", "jumpsuits", "scarf", "skirt",
    "face", "leftArm", "rightArm", "leftLeg", "rightLeg", "leftShoe",
    "rightShoe",
)

# Internal joint order -> LIP CSV order (utils/utils.py:278).
IDX_MAP_TO_LIP = (10, 9, 8, 11, 12, 13, 15, 14, 1, 0, 4, 3, 2, 5, 6, 7)


# --------------------------------------------------------------------------
# Confusion matrix / segmentation metrics
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_classes", "ignore"))
def confusion_matrix(label: jnp.ndarray, pred: jnp.ndarray,
                     num_classes: int, ignore: int = 255) -> jnp.ndarray:
    """On-device confusion matrix.

    ``label``: (B, H, W) int GT; ``pred``: (B, H, W) int predictions (take
    argmax upstream). Returns (num_classes, num_classes) float64-free
    counts; rows = GT, cols = pred (utils/utils.py:192-218).
    """
    valid = label != ignore
    gt = jnp.where(valid, label, 0).astype(jnp.int32).reshape(-1)
    pr = jnp.where(valid, pred, 0).astype(jnp.int32).reshape(-1)
    # One-hot contraction instead of a scatter-add: cm[i,j] =
    # sum_p valid_p * [gt_p == i] * [pr_p == j]. The scatter (millions of
    # updates into a C^2 table) ran at ~1 GB/s on TPU — 10.3 ms/batch,
    # 17% of the eval step; this matmul form takes the MXU. Exact: 0/1
    # products, fp32 accumulation, counts < 2^24.
    c = num_classes
    iota = jax.lax.broadcasted_iota(jnp.int32, (gt.shape[0], c), 1)
    oh_gt = (iota == gt[:, None]).astype(jnp.float32)
    oh_pr = ((iota == pr[:, None]) & valid.reshape(-1)[:, None]
             ).astype(jnp.float32)
    return jax.lax.dot_general(oh_gt, oh_pr, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def seg_metrics(cm: np.ndarray) -> dict:
    """Reductions of the confusion matrix (function.py:1044-1078,
    calc_miou.py:36-91)."""
    cm = np.asarray(cm, np.float64)
    pos = cm.sum(1)
    res = cm.sum(0)
    tp = np.diag(cm)
    iou_array = tp / np.maximum(1.0, pos + res - tp)
    with np.errstate(divide="ignore", invalid="ignore"):
        per_class_acc = tp / pos
        freq = pos / cm.sum()
        union = pos + res - tp
        per_class_iou = np.where(union > 0, tp / union, np.nan)
    return {
        "pixel_acc": tp.sum() / max(cm.sum(), 1.0),
        "mean_acc": np.nanmean(per_class_acc),
        "per_class_acc": per_class_acc,
        "mean_iou": float(iou_array.mean()),
        "iou_array": iou_array,
        "per_class_iou": per_class_iou,
        "fw_iou": float(np.nansum(freq[freq > 0]
                                  * per_class_iou[freq > 0])),
    }


# --------------------------------------------------------------------------
# PCKh@0.5 (LIP protocol, utils/calc_pckh.py)
# --------------------------------------------------------------------------

def read_pose_csv(path: str, has_vis_dim: bool):
    """CSV reader with NaN -> -1 handling (calc_pckh.py:6-33)."""
    labels = []
    with open(path) as f:
        for row in csv.reader(f, delimiter=","):
            vals = [-1.0 if v == "nan" else float(v) for v in row[1:]]
            labels.append(vals)
    data = np.array(labels)
    dim = 3 if has_vis_dim else 2
    data = data.reshape(data.shape[0], data.shape[1] // dim, dim)
    if has_vis_dim:
        vis = data[:, :, 2].copy()
        data = data[:, :, 0:2]
    else:
        vis = np.ones(data.shape[:2])
        data[data < 0] = 1
    return data, vis


def get_head_size(gt: np.ndarray) -> np.ndarray:
    """Head-segment norm from joints 8 (neck) / 9 (head) (calc_pckh.py:35)."""
    head = np.linalg.norm(gt[:, 9, :] - gt[:, 8, :], axis=1)
    head[(gt[:, 8, 0] < 0) | (gt[:, 9, 0] < 0)] = 0
    return head


def norm_dist(pred: np.ndarray, gt: np.ndarray,
              ref_dist: np.ndarray) -> np.ndarray:
    """Head-size normalized distances, -1 for invalid (calc_pckh.py:43-56)."""
    n, p = pred.shape[:2]
    dist = np.full((n, p), -1.0)
    ok = ref_dist > 0
    d = np.linalg.norm(gt - pred, axis=2)
    dist[ok] = d[ok] / ref_dist[ok, None]
    dist[(gt[:, :, 0] < 0) | (gt[:, :, 1] < 0)] = -1
    return dist


def compute_pck(dist: np.ndarray, thresholds=(0.5,)) -> np.ndarray:
    """Per-joint + upper-body + all PCK table (calc_pckh.py:58-82)."""
    p = dist.shape[1]
    pck = np.zeros((len(thresholds), p + 2))
    for ti, th in enumerate(thresholds):
        for j in range(p):
            d = dist[:, j]
            valid = d >= 0
            pck[ti, j] = 100 * np.mean(d[valid] <= th) if valid.any() else 0
        ub = dist[:, 8:16]
        pck[ti, p] = 100 * np.mean(ub[ub >= 0] <= th)
        allj = dist[:, list(range(0, 6)) + list(range(8, 16))]
        pck[ti, p + 1] = 100 * np.mean(allj[allj >= 0] <= th)
    return pck


def pckh_from_arrays(pred: np.ndarray, gt: np.ndarray,
                     gt_vis: np.ndarray | None = None,
                     thresholds=(0.5,)) -> np.ndarray:
    """PCKh over in-memory arrays in LIP CSV joint order (pred/gt: (N,16,2))."""
    ref = get_head_size(gt)
    dist = norm_dist(pred, gt, ref)
    return compute_pck(dist, thresholds)


def calc_pck_lip(gt_path: str, pred_path: str, eval_num: int = 5000):
    """File-protocol evaluator (calc_pckh.py:99-126)."""
    pred, _ = read_pose_csv(pred_path, has_vis_dim=False)
    gt, gt_vis = read_pose_csv(gt_path, has_vis_dim=True)
    pred, gt = pred[:eval_num], gt[:eval_num]
    assert gt.shape == pred.shape, "pred/gt shape mismatch"
    return pckh_from_arrays(pred, gt, gt_vis)


# LIP 20-class names, the reference's eval-table order
# (core/function.py:1033-1036).
LIP_CLASS_NAMES = (
    "background", "hat", "hair", "glove", "sunglasses", "upperclothes",
    "dress", "coat", "socks", "pants", "jumpsuits", "scarf", "skirt",
    "face", "leftArm", "rightArm", "leftLeg", "rightLeg", "leftShoe",
    "rightShoe")


def per_class_table(per_class_iou: np.ndarray,
                    per_class_acc: np.ndarray | None = None,
                    class_names=None) -> str:
    """Per-class IoU (+acc) table (core/function.py:1044-1078). Defaults
    to the LIP class names when the count matches, else class indices."""
    n = len(per_class_iou)
    if class_names is None:
        class_names = (LIP_CLASS_NAMES if n == len(LIP_CLASS_NAMES)
                       else tuple(f"class_{i}" for i in range(n)))
    lines = [f"{'class':>14} {'IoU':>7}"
             + ("" if per_class_acc is None else f" {'acc':>7}")]
    for i, name in enumerate(class_names):
        row = f"{name:>14} {per_class_iou[i]:7.4f}"
        if per_class_acc is not None:
            row += f" {per_class_acc[i]:7.4f}"
        lines.append(row)
    lines.append(f"{'mean':>14} {np.nanmean(per_class_iou):7.4f}"
                 + ("" if per_class_acc is None
                    else f" {np.nanmean(per_class_acc):7.4f}"))
    return "\n".join(lines)


def pckh_table(pck_row: np.ndarray, method_name: str = "Ours") -> str:
    """LIP PCKh table in CSV joint order (calc_pckh.py:84-97)."""
    p = pck_row
    cells = [
        ("Head", (p[8] + p[9]) / 2), ("Sho.", (p[12] + p[13]) / 2),
        ("Elb.", (p[11] + p[14]) / 2), ("Wri.", (p[10] + p[15]) / 2),
        ("Hip", (p[2] + p[3]) / 2), ("Knee", (p[1] + p[4]) / 2),
        ("Ank.", (p[0] + p[5]) / 2), ("U.Body", p[-2]), ("Avg.", p[-1]),
    ]
    head = "PCKh@0.5   " + " ".join(f"{n:>7}" for n, _ in cells)
    vals = f"{method_name:10} " + " ".join(f"{v:7.1f}" for _, v in cells)
    return head + "\n" + vals


def save_pose_csv(im_names, pose_xy: np.ndarray, path: str) -> None:
    """Write predictions in LIP CSV format with the internal->LIP joint
    remap (utils/utils.py:270-289)."""
    with open(path, "w", newline="") as f:
        w = csv.writer(f, delimiter=",")
        for i, name in enumerate(im_names):
            row = [name]
            for j in IDX_MAP_TO_LIP:
                row.append(str(int(pose_xy[i, j, 0])))
                row.append(str(int(pose_xy[i, j, 1])))
            w.writerow(row)


# --------------------------------------------------------------------------
# Heatmap-space PCK (core/evaluate.py)
# --------------------------------------------------------------------------

def _np_max_preds(heatmaps: np.ndarray):
    """(B, J, H, W) -> preds (B, J, 2), maxvals (core/evaluate.py:13-41)."""
    b, j, h, w = heatmaps.shape
    flat = heatmaps.reshape(b, j, -1)
    idx = np.argmax(flat, 2)
    maxvals = np.max(flat, 2)[..., None]
    preds = np.stack([idx % w, idx // w], axis=-1).astype(np.float32)
    preds *= (maxvals > 0).astype(np.float32)
    return preds, maxvals


def heatmap_pck_accuracy(output: np.ndarray, target: np.ndarray,
                         thr: float = 0.5):
    """Train-time heatmap PCK (core/evaluate.py:68-99). Inputs (B,J,H,W)."""
    pred, _ = _np_max_preds(output)
    gt, _ = _np_max_preds(target)
    h, w = output.shape[2], output.shape[3]
    norm = np.array([h, w]) / 10.0
    nj = output.shape[1]
    acc = np.zeros(nj + 1)
    cnt = 0
    avg = 0.0
    for j in range(nj):
        valid = ~((gt[:, j, 0] < 1) & (gt[:, j, 1] < 1))
        if valid.sum() == 0:
            acc[j + 1] = 0
            continue
        d = np.linalg.norm((pred[valid, j] - gt[valid, j]) / norm, axis=1)
        acc[j + 1] = np.mean(d < thr)
        if acc[j + 1] > 0:
            avg += acc[j + 1]
            cnt += 1
    avg = avg / cnt if cnt else 0
    acc[0] = avg
    return acc, avg, cnt, pred


# --------------------------------------------------------------------------
# OKS mAP (core/mAP.py)
# --------------------------------------------------------------------------

PPP_SIGMAS = np.array([1., 1., 1., .8, .8, .6, .6, .6, 1., .8, .8, .6, .6,
                       .6]) / 10


def cal_oks(p_gt: np.ndarray, p_pred: np.ndarray, box: np.ndarray) -> float:
    """Box-area-normalized OKS (core/mAP.py:8-27)."""
    var = (box[0, 2] - box[0, 0]) * (box[0, 3] - box[0, 1]) + np.spacing(1)
    var = 0.06 * var
    vis = p_gt[:, 2]
    dx = p_gt[:, 0] - (p_pred[:, 0] + box[0, 0])
    dy = p_gt[:, 1] - (p_pred[:, 1] + box[0, 1])
    e = (dx ** 2 + dy ** 2) / var / 2
    oks = np.exp(-e)[vis > 0].sum()
    return oks / max((vis > 0).sum(), 1)


def cal_map_image(preds, gt_joints, gt_boxes, hits, counts, thr=0.5):
    """Per-image greedy GT->pred matching + per-joint hit accumulation
    (core/mAP.py:29-76). ``preds``: list of (J,2) person predictions;
    ``gt_joints``: list of (J,3); ``gt_boxes``: list of (1,4)."""
    n_gt = len(gt_joints)
    oks_m = np.zeros((n_gt, len(preds)))
    for i in range(n_gt):
        for j, p in enumerate(preds):
            oks_m[i, j] = cal_oks(gt_joints[i], p, gt_boxes[i])
    match = np.argmax(oks_m, axis=1)
    for i in range(n_gt):
        box = gt_boxes[i]
        var = ((box[0, 2] - box[0, 0]) * (box[0, 3] - box[0, 1])
               + np.spacing(1)) * PPP_SIGMAS ** 2
        p = preds[match[i]]
        dx = gt_joints[i][:, 0] - (p[:, 0] + box[0, 0])
        dy = gt_joints[i][:, 1] - (p[:, 1] + box[0, 1])
        dist = np.exp(-(dx ** 2 + dy ** 2) / var / 2)
        vis = (gt_joints[i][:, 2] > 0).astype(np.float64)
        counts += vis
        if oks_m[i, match[i]] >= thr:
            hits += ((dist >= thr) & (vis > 0)).astype(np.float64)
    return hits, counts


def oks_map(per_image_preds: dict, per_image_gt: dict,
            thresholds=np.arange(0.5, 1.0, 0.05)) -> np.ndarray:
    """AP over OKS thresholds 0.5:0.05:0.95 (core/mAP.py:91-109).

    ``per_image_preds[name]`` = list of (J,2); ``per_image_gt[name]`` =
    (joints list of (J,3), boxes list of (1,4)).
    Returns per-joint AP (+mean as last element) averaged over thresholds.
    """
    n_joints = len(PPP_SIGMAS)
    aps = []
    for t in thresholds:
        hits = np.zeros(n_joints)
        counts = np.zeros(n_joints)
        for name, preds in per_image_preds.items():
            if name not in per_image_gt:
                continue
            gj, gb = per_image_gt[name]
            hits, counts = cal_map_image(preds, gj, gb, hits, counts, thr=t)
        ap = hits / np.maximum(counts, 1)
        aps.append(np.concatenate([ap, [ap.mean()]]))
    return np.mean(np.stack(aps), axis=0)


def ppp_pck_table(pck: np.ndarray, method_name: str = "Ours") -> str:
    """PPP PCK table in 14-joint order (core/function_ppp.py:1081-1094);
    ``pck[0]`` is the average, ``pck[1:]`` per-joint."""
    p = pck
    cells = [
        ("fore", p[1]), ("neck", p[2]), ("sho.", (p[3] + p[9]) / 2),
        ("elb.", (p[4] + p[10]) / 2), ("wri.", (p[5] + p[11]) / 2),
        ("hip", (p[6] + p[12]) / 2), ("knee", (p[7] + p[13]) / 2),
        ("ank.", (p[8] + p[14]) / 2), ("Avg.", p[0]),
    ]
    head = "PCK@0.5    " + " ".join(f"{n:>7}" for n, _ in cells)
    vals = f"{method_name:10} " + " ".join(f"{v:7.1f}" for _, v in cells)
    return head + "\n" + vals


class MulAverageMeter:
    """Vector of running averages (core/evaluate.py:118-136)."""

    def __init__(self, length: int):
        self.sum = np.zeros(length)
        self.count = np.zeros(length)

    def update(self, val, n: int = 1) -> None:
        self.sum += np.asarray(val) * n
        self.count += n

    def val(self) -> np.ndarray:
        return np.where(self.count > 0, self.sum / np.maximum(self.count, 1),
                        0.0)
