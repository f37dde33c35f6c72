"""Evaluation-only CLI: the LIP val protocol from a checkpoint.

The reference has no standalone evaluator — ``validate_sync``
(core/function.py:873-1081) only runs inside the train loop. This CLI is
that protocol as its own entry point: flip-TTA forwards, parsing
channel-swap fusion, on-device pose decode, confusion-matrix mIoU table,
LIP-protocol pose CSV and PCKh@0.5 against the GT CSV — from any orbax
checkpoint (a training run's ``checkpoints/`` dir or
``tools/convert_checkpoint.py`` output). See RUNBOOK.md for the
real-data parity procedure this executes.

Examples:
  # 500-image mini-eval from a converted reference checkpoint
  python tools/eval_lip.py --cfg experiments/lip/384_384.yaml \
      --ckpt converted_ckpt --sample 500
  # full 5000-sample protocol (the reference eval scale)
  python tools/eval_lip.py --cfg experiments/lip/384_384.yaml \
      --ckpt output/lip/augment/384_384/checkpoints
  # int8 serving-accuracy delta: run once with --int8 and diff the tables
  python tools/eval_lip.py --cfg ... --ckpt ... --sample 500 --int8
  # synthetic dry run (no LIP data needed)
  python tools/eval_lip.py --cfg experiments/lip/384_384.yaml \
      --synthetic --tiny
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default="",
                   help="orbax checkpoint dir (empty = fresh init, smoke)")
    p.add_argument("--genotype", default="",
                   help="searched-genotype JSON matching the checkpoint")
    p.add_argument("--sample", type=int, default=0,
                   help="evaluate the first N val samples "
                        "(0 = cfg TRAIN.NUM_SAMPLES, the 5000 protocol)")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="serve the forwards through int8 dense convs")
    p.add_argument("--scanned", action="store_true",
                   help="one-dispatch scanned epoch (device-cached "
                        "batches; fastest on remote runtimes)")
    p.add_argument("--pred-csv", default="",
                   help="write the LIP-protocol pose CSV here")
    p.add_argument("--json-out", default="",
                   help="also dump the metric dict as JSON")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.core.loading import load_eval_model
    from npp_tpu.data import (DataLoader, LIPDataset, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.data.assets import resolve_pose_gt_csv

    cfg, model, variables, size = load_eval_model(
        args.cfg, args.ckpt, args.tiny, genotype=args.genotype)
    params = {"model": variables["params"],
              "criterion": T.init_criterion_params(
                  cfg.model.refine_layers + 1)}

    sample = args.sample or cfg.train.num_samples or -1
    renderer = make_target_renderer(stride=4, sigma=cfg.model.sigma,
                                    num_joints=cfg.dataset.num_joints,
                                    ignore=cfg.train.ignore_label,
                                    normalize_images=True)
    if args.synthetic:
        ds = SyntheticDataset(length=2 * args.batch, crop_size=size,
                              num_joints=cfg.dataset.num_joints,
                              num_classes=cfg.dataset.num_classes,
                              is_train=False, device_normalize=True)
        gt_csv = None
    else:
        ds = LIPDataset(cfg.dataset.root, cfg.dataset.val_imroot,
                        cfg.train.test_set, cfg.dataset.val_segroot,
                        crop_size=size, sigma=cfg.model.sigma,
                        is_train=False, sample=sample,
                        device_normalize=True)
        gt_csv = resolve_pose_gt_csv(cfg.pose_gt_path)
    loader = DataLoader(ds, args.batch, shuffle=False, num_workers=8,
                        renderer=renderer, drop_last=False,
                        cache_on_device=args.scanned)

    kw = dict(num_classes=cfg.dataset.num_classes,
              class_weights=LIP_CLASS_WEIGHTS, flip_test=cfg.test.flip_test,
              ignore_index=cfg.train.ignore_label,
              flip_pairs=((14, 15), (16, 17), (18, 19)),
              decode_hw=(size[1], size[0]),
              quantize="int8" if args.int8 else None)
    pred_csv = args.pred_csv or (None if gt_csv is None else
                                 os.path.join(".", "pose_pred.csv"))
    if args.scanned:
        epoch = E.make_eval_epoch(model, **kw)
        result = E.validate_scanned(
            epoch, params, variables["batch_stats"], loader,
            num_classes=cfg.dataset.num_classes, gt_csv=gt_csv,
            pred_csv=pred_csv)
    else:
        step = E.make_eval_step(model, **kw)
        result = E.validate(
            step, params, variables["batch_stats"], loader,
            num_classes=cfg.dataset.num_classes, gt_csv=gt_csv,
            pred_csv=pred_csv)

    from npp_tpu.utils.metrics import per_class_table

    print(per_class_table(result["per_class_iou"],
                          result.get("per_class_acc")))
    line = (f"n={len(result['names'])} loss={result['loss']:.4f} "
            f"pixel_acc={result['pixel_acc']:.4f} "
            f"mIoU={result['mean_iou']:.4f}")
    if "pck_avg" in result:
        line += f" PCKh@0.5={result['pck_avg']:.2f}"
    print(line)
    if args.json_out:
        blob = {k: (v.tolist() if hasattr(v, "tolist") else v)
                for k, v in result.items()
                if k not in ("pose_preds", "names", "pck")}
        with open(args.json_out, "w") as f:
            json.dump(blob, f, indent=1)
        print(f"wrote {args.json_out}")


if __name__ == "__main__":
    main()
