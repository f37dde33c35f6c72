"""Distributed evaluation engine: flip-TTA, mIoU, PCKh.

TPU-native re-design of reference ``validate_sync``
(core/function.py:873-1081):
- both forwards (direct + flipped) and the parsing channel-swap fusion run
  inside ONE jitted step;
- the confusion matrix accumulates on device (utils/utils.py:192's
  bincount becomes a scatter-add) — under a sharded batch the accumulation
  is global, replacing the reference's ``dist.reduce``;
- the per-joint CPU decode hot loop (function.py:971-989) is the batched
  jitted ``decode_pose_validate``;
- the reference's rank-CSV + barrier + glob merge (function.py:997-1013)
  disappears: predictions are gathered as device arrays and evaluated
  in-memory (CSV protocol still available via utils.metrics for parity).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from npp_tpu.core import criterion as crit
from npp_tpu.core.inference import decode_pose_validate, flip_parsing_fuse
from npp_tpu.ops.resize import resize_bilinear
from npp_tpu.utils import metrics as M


def make_eval_step_body(model, *, num_classes: int, class_weights,
                        flip_test: bool = True, ignore_index: int = 255,
                        ohem_thres: float = 0.9, ohem_keep: int = 131072,
                        flip_pairs=((14, 15), (16, 17), (18, 19)),
                        pose_flip_idx=None,
                        decode_hw: tuple[int, int] = (384, 384),
                        blur_sigma: float = 3.0,
                        quantize: str | None = None,
                        dark: bool = False):
    """The pure (unjitted) eval-step function — composable into a scanned
    whole-epoch program (make_eval_epoch) or jitted per batch
    (make_eval_step).

    ``quantize="int8"`` serves the forwards with int8 dense convs
    (ops/quantize.py); losses/decode/metrics stay fp32.
    ``dark=True`` refines keypoints with DARK sub-pixel decode
    (inference.post_process_dark; off by default for decode parity).

    fn(params, batch_stats, batch) ->
      {loss, loss_pose, loss_par, cm, pose_pred (B,J,3), par_pred (B,H,W)}.
    """
    from npp_tpu.ops.quantize import quantized_convs

    def step(params, batch_stats, batch):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        # int8 v2 (ops/quantize.py): pre-quantized weights / calibrated
        # static activation scales ride along in ``params`` so they stay
        # jit ARGUMENTS (closures over ~100MB trees break the relay).
        for col in ("qconst", "act_scales"):
            if col in params:
                variables[col] = params[col]
        image = batch["image"]
        with quantized_convs(quantize):
            pose_list, par_list = model.apply(variables, image, train=False)
            if flip_test:
                flip_pose, flip_par = model.apply(
                    variables, image[:, :, ::-1, :], train=False)
        losses_pose = crit.pose_loss(pose_list, batch["pose"],
                                     batch.get("pose_aux"),
                                     params["criterion"]["lamda_pose"])
        losses_par = crit.parsing_loss(par_list, batch["par"], batch["edge"],
                                       params["criterion"]["lamda_par"],
                                       class_weights=class_weights,
                                       ignore_index=ignore_index,
                                       thres=ohem_thres, min_kept=ohem_keep)
        loss = losses_pose + losses_par

        # Parsing: last stage, upsample to label size, flip-fuse, argmax
        # (function.py:921-939,955-960).
        h, w = batch["par"].shape[1], batch["par"].shape[2]
        par = resize_bilinear(par_list[-1][0].astype(jnp.float32), (h, w),
                              align_corners=False)
        if flip_test:
            fpar = resize_bilinear(flip_par[-1][0].astype(jnp.float32),
                                   (h, w), align_corners=False)
            par = flip_parsing_fuse(par, fpar, flip_pairs)
        par_pred = jnp.argmax(par, axis=-1).astype(jnp.int32)
        cm = M.confusion_matrix(batch["par"], par_pred, num_classes,
                                ignore_index)

        # Pose: last stage heatmaps (+ flipped) -> decoded coords.
        pose_hm = pose_list[-1][0].astype(jnp.float32)
        flip_hm = (flip_pose[-1][0].astype(jnp.float32)
                   if flip_test else None)
        n_j = pose_hm.shape[-1]
        from npp_tpu.core.inference import FLIPPED_POSEIDX, FLIPPED_POSEIDX_PPP
        fidx = pose_flip_idx or (FLIPPED_POSEIDX if n_j == 16
                                 else FLIPPED_POSEIDX_PPP if n_j == 14
                                 else tuple(range(n_j)))
        pose_pred = decode_pose_validate(pose_hm, flip_hm,
                                         batch["crop_param"], batch["scale"],
                                         decode_hw, blur_sigma, fidx,
                                         dark=dark)
        return {"loss": loss, "loss_pose": losses_pose,
                "loss_par": losses_par, "cm": cm, "pose_pred": pose_pred,
                "par_pred": par_pred}

    return step


def make_eval_step(model, n_data: int = 1, **kw):
    """Jitted per-batch eval step (see make_eval_step_body).

    Performance: PER-DEVICE batches should be multiples of 8 — other
    sizes underfill the v5e register tile (measured 3.3x/img collapse at
    bs12; BENCH.md batch-size profile). Warns via
    ``train.warn_batch_tiling``; pass ``n_data`` (the active mesh's
    data-axis size) when feeding unsharded global batches."""
    from npp_tpu.core.train import warn_batch_tiling

    jitted = jax.jit(make_eval_step_body(model, **kw))

    def wrapped(params, batch_stats, batch):
        warn_batch_tiling(batch["image"], "eval_step", n_data)
        return jitted(params, batch_stats, batch)

    return wrapped


class _EvalEpoch:
    """Callable epoch program plus a per-batch ``step`` for tail batches.

    ``__call__`` runs the one-dispatch scanned epoch; ``step`` is the same
    eval-step body jitted standalone, used by ``validate_scanned`` to score
    a short tail batch exactly (its own compile at the tail shape)."""

    def __init__(self, epoch_fn, step_fn):
        self._epoch_fn = epoch_fn
        self.step = step_fn

    def __call__(self, params, batch_stats, batches):
        return self._epoch_fn(params, batch_stats, batches)


def make_eval_epoch(model, **kw):
    """Whole-epoch eval as ONE jitted program: lax.scan of the eval step
    over stacked batches.

    One dispatch per epoch instead of one per batch — on remote/tunneled
    runtimes the per-call dispatch latency otherwise dominates (the
    reference instead paid a per-image CPU decode loop,
    core/function.py:967-989). Use with ``stack_batches`` over a
    device-cached loader.

    fn(params, batch_stats, batches) where each leaf of ``batches`` has a
    leading batch-count axis -> {cm (C,C) summed, loss (N,), pose_pred
    (N,B,J,3), par_pred (N,B,H,W)}. The returned object also carries
    ``.step`` (the per-batch jitted body) so ``validate_scanned`` can score
    a non-divisible dataset's tail batch exactly.
    """
    body = make_eval_step_body(model, **kw)

    @jax.jit
    def epoch(params, batch_stats, batches):
        def f(cm, batch):
            out = body(params, batch_stats, batch)
            return cm + out["cm"], {"loss": out["loss"],
                                    "pose_pred": out["pose_pred"],
                                    "par_pred": out["par_pred"]}

        n_cls = kw["num_classes"]
        cm, ys = jax.lax.scan(f, jnp.zeros((n_cls, n_cls), jnp.float32),
                              batches)
        return {"cm": cm, **ys}

    return _EvalEpoch(epoch, jax.jit(body))


def stack_batches(batches: list[dict]):
    """Stack same-shape batch dicts along a new leading axis.

    A short TAIL batch (``drop_last=False`` on a non-divisible dataset) is
    split off and returned separately rather than padded: padding cannot be
    made bit-exact because the OHEM parsing loss's ``min_kept`` top-k is a
    whole-batch quantity (core/criterion.py) — padded pixels would change
    which hard examples are kept. ``validate_scanned`` scores the tail with
    its own jitted step instead (exact, one extra compile at the tail
    shape). Reference behavior for comparison: core/function.py:873-1081
    evaluates every sample.

    Returns (stacked_dict, names, dataset_indices, tail_batch) — arrays
    stay on device; names/indices are host-side (tail samples' names come
    last, matching per-batch loader order); ``tail_batch`` is None when all
    batches are shape-uniform."""
    keys = [k for k in batches[0] if k not in ("names", "index")]
    tail = None
    lead = {k: max(tuple(b[k].shape)[0] for b in batches) for k in keys}
    last = batches[-1]
    if any(tuple(last[k].shape)[0] != lead[k] for k in keys):
        tail = last
        batches = batches[:-1]
    for k in keys:
        shapes = {tuple(b[k].shape) for b in batches}
        if len(shapes) > 1:
            raise ValueError(
                f"stack_batches needs shape-uniform batches (apart from one "
                f"short tail batch at the end); key {k!r} has shapes "
                f"{sorted(shapes)}")
    out = ({k: jnp.stack([b[k] for b in batches]) for k in keys}
           if batches else None)
    names = []
    idxs = []
    for b in batches + ([tail] if tail is not None else []):
        names.extend(b.get("names", []))
        if b.get("index") is not None:
            idxs.append(np.asarray(b["index"]))
    return out, names, (np.concatenate(idxs) if idxs else None), tail


def merge_eval_shards(preds: np.ndarray, idxs: np.ndarray,
                      names: Optional[list] = None,
                      names_src: Optional[list] = None
                      ) -> tuple[np.ndarray, list]:
    """Reorder gathered predictions into canonical dataset order.

    The reference merges per-rank CSVs in rank order
    (core/function.py:997-1013), which interleaves DistributedSampler's
    strided shards — prediction rows land out of GT-row order. Here every
    prediction carries its dataset index, so the merged output is sorted
    back into dataset order regardless of sharding.

    ``names`` is a per-prediction name list (single-process case);
    ``names_src`` is a dataset-order name table indexed by dataset index
    (multi-host case, where only local names exist per process)."""
    order = np.argsort(idxs, kind="stable")
    # Drop wrap-padding duplicates (DistributedSampler pads by repeating).
    keep = np.concatenate([[True], np.diff(idxs[order]) != 0])
    sel = order[keep]
    if names:
        merged_names = [names[i] for i in sel]
    elif names_src:
        merged_names = [names_src[i] for i in idxs[sel]]
    else:
        merged_names = []
    return preds[sel], merged_names


def validate(eval_step, params, batch_stats, loader, *, num_classes: int,
             gt_csv: Optional[str] = None, pred_csv: Optional[str] = None,
             log_fn=print) -> dict:
    """Epoch-level validation driver (validate_sync semantics).

    Multi-host: each process evaluates its loader shard; the confusion
    matrix, losses, and predictions are merged with
    ``multihost_utils.process_allgather`` over DCN — replacing the
    reference's per-rank CSV dump + barrier + filesystem glob merge
    (core/function.py:997-1013). Every process returns the same result.

    Returns dict with loss, mean_iou, iou_array, pixel_acc and — when a
    PCKh GT CSV is available — pck table and pck_avg.
    """
    # Device results are NOT fetched inside the loop: keeping cm / loss /
    # preds as device arrays lets dispatch run ahead of the host (the
    # reference's per-image CPU decode, function.py:967-989, is the
    # bottleneck being replaced). One fetch after the loop drains all.
    cm_dev = None
    losses_dev = []
    all_preds = []
    all_names = []
    all_idx = []
    for batch in loader:
        names = batch.get("names", [])
        idx = batch.get("index")
        batch = {k: v for k, v in batch.items()
                 if k not in ("names", "index")}
        out = eval_step(params, batch_stats, batch)
        cm_dev = out["cm"] if cm_dev is None else cm_dev + out["cm"]
        losses_dev.append(out["loss"])
        all_preds.append(out["pose_pred"])
        all_names.extend(names)
        if idx is not None:
            all_idx.append(np.asarray(idx))
    cm = (np.asarray(cm_dev, np.float64) if cm_dev is not None
          else np.zeros((num_classes, num_classes), np.float64))
    losses = (list(np.asarray(jnp.stack(losses_dev), np.float64))
              if losses_dev else [])
    preds = (np.concatenate([np.asarray(p) for p in all_preds], axis=0)
             if all_preds else np.zeros((0, 16, 3)))

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mh

        # Equal per-process shapes are guaranteed by the loader's padded
        # DistributedSampler-style slicing (data/loader.py).
        cm = np.asarray(mh.process_allgather(cm)).sum(axis=0)
        losses = list(np.ravel(mh.process_allgather(
            np.asarray(losses, np.float64))))
        preds = np.asarray(mh.process_allgather(preds)).reshape(
            (-1,) + preds.shape[1:])
        if all_idx:
            idxs = np.concatenate(all_idx)
            idxs = np.asarray(mh.process_allgather(idxs)).reshape(-1)
            names_src = (loader.dataset.image_names()
                         if hasattr(loader, "dataset")
                         and hasattr(loader.dataset, "image_names") else [])
            if not names_src and (gt_csv is not None
                                  or pred_csv is not None):
                log_fn("validate: dataset has no image_names(); "
                       "pred_csv/PCKh output will be skipped")
            preds, all_names = merge_eval_shards(preds, idxs,
                                                 names_src=names_src)
    elif all_idx:
        idxs = np.concatenate(all_idx)
        preds, all_names = merge_eval_shards(preds, idxs, all_names)

    seg = M.seg_metrics(cm)
    result = {"loss": float(np.mean(losses)) if losses else float("nan"),
              **seg}
    result["pose_preds"] = preds
    result["names"] = all_names

    if pred_csv is not None and len(all_names):
        M.save_pose_csv(all_names, preds, pred_csv)
    if gt_csv is not None and pred_csv is not None and len(all_names):
        pck = M.calc_pck_lip(gt_csv, pred_csv, eval_num=len(all_names))
        result["pck"] = pck
        result["pck_avg"] = float(pck[-1][-1])
        log_fn(M.pckh_table(pck[-1]))
    return result


def validate_scanned(eval_epoch, params, batch_stats, loader, *,
                     num_classes: int, gt_csv: Optional[str] = None,
                     pred_csv: Optional[str] = None, log_fn=print) -> dict:
    """Single-dispatch validation: stack the loader's batches and run the
    whole epoch in one jitted scan (make_eval_epoch). Best combined with a
    ``cache_on_device`` loader.

    Multi-process: each process scans its own loader shard in one
    dispatch, then the confusion matrix / losses / predictions are merged
    over DCN with ``process_allgather`` and reordered by dataset index —
    same merge as ``validate`` (exercised by tests/test_multiprocess.py);
    every process returns the same result.

    A non-divisible dataset's short tail batch (``drop_last=False``) is
    scored exactly through a separate per-batch step (``eval_epoch.step``,
    provided by ``make_eval_epoch``) rather than padded — see
    ``stack_batches`` for why padding cannot be bit-exact under OHEM."""
    batches = list(loader)
    stacked, names, idxs, tail = stack_batches(batches)
    if tail is not None and getattr(eval_epoch, "step", None) is None:
        raise ValueError(
            "loader yielded a short tail batch but eval_epoch has no .step "
            "— build it with make_eval_epoch (or use drop_last=True)")
    if stacked is not None:
        out = eval_epoch(params, batch_stats, stacked)
        cm = np.asarray(out["cm"], np.float64)
        losses = np.asarray(out["loss"], np.float64)
        preds = np.asarray(out["pose_pred"])
        preds = preds.reshape((-1,) + preds.shape[2:])
    else:
        n_cls = num_classes
        cm = np.zeros((n_cls, n_cls), np.float64)
        losses = np.zeros((0,), np.float64)
        preds = None
    if tail is not None:
        tail_in = {k: v for k, v in tail.items()
                   if k not in ("names", "index")}
        n_tail = tail_in["image"].shape[0]
        log_fn(f"validate_scanned: short tail batch of {n_tail} sample(s) "
               f"scored in a separate exact step (not padded/dropped)")
        tout = eval_epoch.step(params, batch_stats, tail_in)
        cm = cm + np.asarray(tout["cm"], np.float64)
        losses = np.concatenate(
            [losses, [np.asarray(tout["loss"], np.float64)]])
        tpred = np.asarray(tout["pose_pred"])
        preds = (tpred if preds is None
                 else np.concatenate([preds, tpred], axis=0))
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils as mh

        cm = np.asarray(mh.process_allgather(cm)).sum(axis=0)
        losses = np.ravel(mh.process_allgather(losses))
        preds = np.asarray(mh.process_allgather(preds)).reshape(
            (-1,) + preds.shape[1:])
        if idxs is not None:
            idxs_g = np.asarray(mh.process_allgather(idxs)).reshape(-1)
            names_src = (loader.dataset.image_names()
                         if hasattr(loader, "dataset")
                         and hasattr(loader.dataset, "image_names") else [])
            if not names_src and (gt_csv is not None
                                  or pred_csv is not None):
                log_fn("validate_scanned: dataset has no image_names(); "
                       "pred_csv/PCKh output will be skipped")
            preds, names = merge_eval_shards(preds, idxs_g,
                                             names_src=names_src)
    elif idxs is not None:
        preds, names = merge_eval_shards(preds, idxs, names)
    seg = M.seg_metrics(cm)
    result = {"loss": float(losses.mean()) if losses.size else float("nan"),
              **seg, "pose_preds": preds, "names": names}
    if pred_csv is not None and names:
        M.save_pose_csv(names, preds, pred_csv)
    if gt_csv is not None and pred_csv is not None and names:
        pck = M.calc_pck_lip(gt_csv, pred_csv, eval_num=len(names))
        result["pck"] = pck
        result["pck_avg"] = float(pck[-1][-1])
        log_fn(M.pckh_table(pck[-1]))
    return result


def make_ppp_eval_step(model, *, num_classes: int, class_weights,
                       flip_test: bool = True, ignore_index: int = 255,
                       ohem_thres: float = 0.9, ohem_keep: int = 131072):
    """PPP validate step (core/function_ppp.py:869-1080): parsing handled
    like LIP (without left/right class pairs); pose scored in heatmap space
    — direct and flipped heatmaps are channel-remapped and averaged.

    Divergence from the reference (documented): the reference averages the
    flipped prediction WITHOUT spatially unflipping it
    (function_ppp.py:957-959), which mixes mirror-image heatmaps; we unflip
    spatially before averaging.
    """
    from npp_tpu.core.inference import FLIPPED_POSEIDX_PPP

    def step(params, batch_stats, batch):
        variables = {"params": params["model"], "batch_stats": batch_stats}
        # int8 v2 (ops/quantize.py): pre-quantized weights / calibrated
        # static activation scales ride along in ``params`` so they stay
        # jit ARGUMENTS (closures over ~100MB trees break the relay).
        for col in ("qconst", "act_scales"):
            if col in params:
                variables[col] = params[col]
        image = batch["image"]
        pose_list, par_list = model.apply(variables, image, train=False)
        if flip_test:
            flip_pose, flip_par = model.apply(
                variables, image[:, :, ::-1, :], train=False)
        losses_pose = crit.pose_loss(pose_list, batch["pose"],
                                     batch.get("pose_aux"),
                                     params["criterion"]["lamda_pose"])
        losses_par = crit.parsing_loss(
            par_list, batch["par"], batch["edge"],
            params["criterion"]["lamda_par"], class_weights=class_weights,
            ignore_index=ignore_index, thres=ohem_thres, min_kept=ohem_keep)
        loss = losses_pose + losses_par

        h, w = batch["par"].shape[1], batch["par"].shape[2]
        par = resize_bilinear(par_list[-1][0].astype(jnp.float32), (h, w),
                              align_corners=False)
        if flip_test:
            fpar = resize_bilinear(flip_par[-1][0].astype(jnp.float32),
                                   (h, w), align_corners=False)
            par = flip_parsing_fuse(par, fpar, flip_pairs=())
        par_pred = jnp.argmax(par, axis=-1).astype(jnp.int32)
        cm = M.confusion_matrix(batch["par"], par_pred, num_classes,
                                ignore_index)

        hm = pose_list[-1][0].astype(jnp.float32)
        if flip_test:
            fl = flip_pose[-1][0].astype(jnp.float32)
            fl = fl[..., jnp.asarray(FLIPPED_POSEIDX_PPP)]
            hm = 0.5 * (hm + fl[:, :, ::-1, :])
        return {"loss": loss, "cm": cm, "pose_hm": hm, "par_pred": par_pred}

    return jax.jit(step)


def validate_ppp(eval_step, params, batch_stats, loader, *,
                 num_classes: int, num_joints: int = 14,
                 log_fn=print) -> dict:
    """PPP epoch validation: mIoU from the confusion matrix + in-loop
    heatmap PCK with MulAverageMeter (function_ppp.py:957-962, 1081-1094)."""
    cm = np.zeros((num_classes, num_classes), np.float64)
    acc = M.MulAverageMeter(num_joints + 1)
    losses = []
    for batch in loader:
        batch = {k: v for k, v in batch.items() if k != "names"}
        out = eval_step(params, batch_stats, batch)
        cm += np.asarray(out["cm"], np.float64)
        losses.append(float(out["loss"]))
        hm = np.asarray(out["pose_hm"]).transpose(0, 3, 1, 2)
        gt = np.asarray(batch["pose"]).transpose(0, 3, 1, 2)
        acc1, avg_acc, cnt, _ = M.heatmap_pck_accuracy(hm, gt)
        acc.update(acc1, max(cnt, 1))
    seg = M.seg_metrics(cm)
    pck = acc.val() * 100
    log_fn(M.ppp_pck_table(pck))
    return {"loss": float(np.mean(losses)) if losses else float("nan"),
            **seg, "pck": pck, "pck_avg": float(pck[0])}
