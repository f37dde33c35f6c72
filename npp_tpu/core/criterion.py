"""Dual-task losses with learned homoscedastic uncertainty weighting.

TPU-native re-expression of reference ``core/criterion.py``:
- ``pose_loss`` — per-joint MSE over heatmaps + aux head, deep supervision
  across stages with learned ``exp(-lam)*L + lam`` weights (Criterion_pose:74,
  lam init -2.5);
- ``parsing_loss`` — OHEM cross-entropy with LIP/Pascal class weights plus
  pos/neg-balanced edge CE, same learned weights (Criterion_par:148, lam init
  2.3, OHEM thres 0.9 / min_kept 131072).

All functions are pure; the lambdas live in the train-state params (the
reference registers them as ``nn.Parameter`` inside the criteria and adds
them to the weight optimizer, search_lip_sync.py:277-278).

OHEM is reformulated for TPU: instead of a full sort over ~2.4M pixel
losses (criterion.py:66), the k-th smallest GT-probability is found with a
fixed-iteration bisection over [0,1] (exact to float precision, no O(N log N)
sort, fuses into one XLA reduction loop).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from npp_tpu.ops.resize import resize_bilinear

# Per-class CE weights (reference core/criterion.py:13-21).
PASCAL_CLASS_WEIGHTS = (
    0.82877791, 0.95688253, 0.94921949, 1.00538108, 1.0201687, 1.01665831,
    1.05470914,
)
LIP_CLASS_WEIGHTS = (
    0.7602572, 0.94236198, 0.85644457, 1.04346266, 1.10627293, 0.80980162,
    0.95168713, 0.8403769, 1.05798412, 0.85746254, 1.01274366, 1.05854692,
    1.03430773, 0.84867818, 0.88027721, 0.87580925, 0.98747462, 0.9876475,
    1.00016535, 1.00108882,
)


def init_pose_lamda(num_stages: int) -> jnp.ndarray:
    """Criterion_pose lamda init (criterion.py:79)."""
    return -2.5 * jnp.ones((num_stages,), jnp.float32)


def init_par_lamda(num_stages: int) -> jnp.ndarray:
    """Criterion_par lamda init (criterion.py:156)."""
    return 2.3 * jnp.ones((num_stages,), jnp.float32)


def _mse(a, b):
    return jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))


def joint_mse_loss(output: jnp.ndarray, target: jnp.ndarray,
                   output_aux: Optional[jnp.ndarray] = None,
                   target_aux: Optional[jnp.ndarray] = None,
                   target_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-joint heatmap MSE (criterion.py:82-128).

    ``output``: (B, H, W, J) NHWC heatmaps; ``target`` likewise. The
    reference computes an MSELoss per joint then sums and divides by J —
    identical to the mean over all elements times 1 (since each per-joint
    mean is over B*H*W elements). Optional ``target_weight`` (B, J) masks
    joints before the MSE.
    """
    th, tw = target.shape[1], target.shape[2]
    if output.shape[1:3] != (th, tw):
        output = resize_bilinear(output, (th, tw), align_corners=False)
    if target_weight is not None:
        w = target_weight[:, None, None, :]
        loss = _mse(output * w, target * w)
    else:
        loss = _mse(output, target)
    if output_aux is not None and target_aux is not None:
        if output_aux.shape[1:3] != (th, tw):
            output_aux = resize_bilinear(output_aux, (th, tw),
                                         align_corners=False)
        if target_weight is not None:
            w = target_weight[:, None, None, :]
            loss = loss + _mse(output_aux * w, target_aux * w)
        else:
            loss = loss + _mse(output_aux, target_aux)
    return loss


def pose_loss(outputs: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
              target: jnp.ndarray, target_aux: Optional[jnp.ndarray],
              lamda: jnp.ndarray,
              target_weight: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Deep-supervised pose loss over stages (criterion.py:130-145)."""
    total = 0.0
    for i, (out, out_aux) in enumerate(outputs):
        li = joint_mse_loss(out, target, out_aux, target_aux, target_weight)
        total = total + li * jnp.exp(-lamda[i]) + lamda[i]
    return total


def _onehot(idx: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """One-hot used to express per-pixel label lookups as contractions.

    ``table[idx]`` (a 1-D gather by millions of pixel indices) and
    ``take_along_axis(logp, idx)`` lower to kCustom gather fusions that
    run at ~1.5 GB/s on TPU (measured: 4 x ~37 ms per bs16/384px train
    step = 41% of the step), and the take_along_axis backward is a
    scatter. ``sum(logp * onehot)`` / ``onehot @ table`` instead fuse
    into the surrounding log_softmax as broadcast-iota-compare-select
    reductions — VPU-friendly, never materialized, with a plain multiply
    backward."""
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (num_classes,),
                                    idx.ndim)
    return (iota == idx[..., None]).astype(jnp.float32)


def _kth_smallest_bisect(values: jnp.ndarray, valid: jnp.ndarray, k: int,
                         lo: float = 0.0, hi: float = 1.0,
                         iters: int = 31) -> jnp.ndarray:
    """EXACT k-th smallest of the non-negative ``values[valid]`` via
    binary search over fp32 bit patterns.

    Replaces the reference's full sort (criterion.py:66) with ``iters``
    masked-count reductions — dramatically cheaper on TPU than sorting
    millions of elements. Non-negative fp32 values are monotonic in their
    int32 bit patterns, so an integer binary search for the smallest bit
    pattern t with count(bits <= t) >= k lands exactly on the k-th
    smallest value's bits in <= 31 steps. Exactness matters because the
    caller compares ``prob < kth`` strictly (reference criterion.py:66-71):
    a threshold epsilon above the true value would keep one extra pixel.
    """
    vals = jnp.where(valid, values.astype(jnp.float32),
                     jnp.float32(hi) * 2 + 1)
    bits = jax.lax.bitcast_convert_type(vals, jnp.int32)
    hi_b = jax.lax.bitcast_convert_type(jnp.float32(hi) * 2 + 1, jnp.int32)

    def body(_, state):
        low, high = state  # invariant: answer in [low, high]
        mid = (low + high) // 2
        count = jnp.sum((bits <= mid).astype(jnp.int32))
        low = jnp.where(count < k, mid + 1, low)
        high = jnp.where(count < k, high, mid)
        return (low, high)

    low, _ = jax.lax.fori_loop(
        0, iters, body, (jnp.int32(0), hi_b))
    return jax.lax.bitcast_convert_type(low, jnp.float32)


def ohem_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                       class_weights: Sequence[float],
                       ignore_index: int = 255, thres: float = 0.9,
                       min_kept: int = 131072) -> jnp.ndarray:
    """Online hard-example-mining CE (criterion.py:43-72).

    ``logits``: (B, H, W, C) at target resolution; ``target``: (B, H, W)
    int labels. Semantics: per-pixel weighted CE; keep valid pixels whose
    softmax prob of the GT class is < max(thres, kth-smallest prob among
    valid) where k = min(min_kept, n_valid - 1); plain mean of kept losses.
    """
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)

    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = _onehot(tgt, num_classes)
    gt_logp = jnp.sum(logp * onehot, axis=-1)
    w = onehot @ jnp.asarray(class_weights, jnp.float32)
    pixel_losses = -gt_logp * w
    gt_prob = jnp.exp(gt_logp)

    n_valid = jnp.sum(valid.astype(jnp.int32))
    # Reference indexes sorted[min(min_kept, numel-1)] i.e. the
    # (min_kept+1)-th smallest when enough pixels are valid.
    k = jnp.minimum(jnp.int32(min_kept + 1), jnp.maximum(n_valid, 1))
    flat_prob = gt_prob.reshape(-1)
    flat_valid = valid.reshape(-1)
    min_value = _kth_smallest_bisect(flat_prob, flat_valid,
                                     k.astype(jnp.int32))
    threshold = jnp.maximum(min_value, thres)

    keep = flat_valid & (flat_prob < threshold)
    kept_losses = jnp.where(keep, pixel_losses.reshape(-1), 0.0)
    denom = jnp.maximum(jnp.sum(keep.astype(jnp.float32)), 1.0)
    return jnp.sum(kept_losses) / denom


def weighted_cross_entropy(logits: jnp.ndarray, target: jnp.ndarray,
                           weights: jnp.ndarray,
                           ignore_index: int = 255) -> jnp.ndarray:
    """torch ``F.cross_entropy(weight=..., ignore_index=...)`` equivalent:
    weighted mean = sum(w_t * nll_t) / sum(w_t) over non-ignored pixels."""
    logits = logits.astype(jnp.float32)
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = _onehot(tgt, logits.shape[-1])
    nll = -jnp.sum(logp * onehot, axis=-1)
    w = (onehot @ weights.astype(jnp.float32)) * valid.astype(jnp.float32)
    return jnp.sum(nll * w) / jnp.maximum(jnp.sum(w), 1e-12)


def single_parsing_loss(par_logits: jnp.ndarray, edge_logits: jnp.ndarray,
                        target_par: jnp.ndarray, target_edge: jnp.ndarray,
                        class_weights: Sequence[float],
                        ignore_index: int = 255, thres: float = 0.9,
                        min_kept: int = 131072) -> jnp.ndarray:
    """One refinement stage's parsing+edge loss (criterion.py:158-202)."""
    h, w = target_par.shape[1], target_par.shape[2]
    par_logits = resize_bilinear(par_logits.astype(jnp.float32), (h, w),
                                 align_corners=True)
    edge_logits = resize_bilinear(edge_logits.astype(jnp.float32), (h, w),
                                  align_corners=True)
    loss = ohem_cross_entropy(par_logits, target_par, class_weights,
                              ignore_index, thres, min_kept)
    # Pos/neg-balanced edge weights computed from the batch's edge mask
    # (criterion.py:161-166).
    pos = jnp.sum((target_edge == 1).astype(jnp.float32))
    neg = jnp.sum((target_edge == 0).astype(jnp.float32))
    tot = pos + neg
    edge_w = jnp.stack([pos / tot, neg / tot])  # [weight_neg?]: see below
    # reference: weights = [weight_neg, weight_pos] = [pos/(p+n), neg/(p+n)]
    # indexed by class id (0=non-edge, 1=edge).
    loss = loss + weighted_cross_entropy(edge_logits, target_edge, edge_w,
                                         ignore_index)
    return loss


def parsing_loss(outputs: Sequence[tuple[jnp.ndarray, jnp.ndarray]],
                 target_par: jnp.ndarray, target_edge: jnp.ndarray,
                 lamda: jnp.ndarray,
                 class_weights: Sequence[float] = LIP_CLASS_WEIGHTS,
                 ignore_index: int = 255, thres: float = 0.9,
                 min_kept: int = 131072) -> jnp.ndarray:
    """Deep-supervised parsing loss over stages (criterion.py:204-217)."""
    total = 0.0
    for i, (par_logits, edge_logits) in enumerate(outputs):
        li = single_parsing_loss(par_logits, edge_logits, target_par,
                                 target_edge, class_weights, ignore_index,
                                 thres, min_kept)
        total = total + li * jnp.exp(-lamda[i]) + lamda[i]
    return total
