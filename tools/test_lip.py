"""Segmentation test CLI: multi-scale eval and/or palette-PNG export.

Equivalent of the reference TEST phase (core/function.py ``testval``:1339
multi-scale sliding-window eval and ``test``:1399 palette PNG export,
driven by TEST.* config keys).

Examples:
  # multi-scale mIoU eval from the best checkpoint
  python tools/test_lip.py --cfg experiments/lip/384_384.yaml \
      --ckpt output/lip/augment/384_384/checkpoints --mode testval
  # export parsing PNGs (synthetic smoke)
  python tools/test_lip.py --cfg experiments/lip/384_384.yaml \
      --synthetic --tiny --mode test --out preds/
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--mode", choices=["testval", "test"], default="testval")
    p.add_argument("--ckpt", default="",
                   help="checkpoint dir (empty = fresh init, smoke only)")
    p.add_argument("--out", default="test_results")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--mesh", action="store_true",
                   help="shard each image's multi-scale tile batch over "
                        "all devices (data axis; SCALING.md)")
    args = p.parse_args()

    from npp_tpu.core import test_seg
    from npp_tpu.core.loading import load_eval_model
    from npp_tpu.data import DataLoader, LIPDataset, SyntheticDataset

    cfg, model, variables, size = load_eval_model(args.cfg, args.ckpt,
                                                  args.tiny)

    if args.synthetic:
        ds = SyntheticDataset(length=args.limit or 4, crop_size=size,
                              num_joints=cfg.dataset.num_joints,
                              num_classes=cfg.dataset.num_classes,
                              is_train=False)
    else:
        ds = LIPDataset(cfg.dataset.root, cfg.dataset.test_imroot,
                        cfg.test.test_set, cfg.dataset.val_segroot,
                        crop_size=size, is_train=False,
                        sample=args.limit or -1)
    loader = DataLoader(ds, 1, shuffle=False, num_workers=4,
                        drop_last=False)

    apply_fn = test_seg.make_parsing_apply_fn(model)
    scales = cfg.test.scale_list if not args.tiny else (0.5, 1.0)
    mesh = None
    if args.mesh:
        from npp_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
    if args.mode == "testval":
        metrics = test_seg.testval(apply_fn, variables, loader,
                                   num_classes=cfg.dataset.num_classes,
                                   scales=scales,
                                   flip=cfg.test.flip_test,
                                   crop_size=(size[1], size[0]),
                                   ignore=cfg.train.ignore_label,
                                   mesh=mesh)
        print(f"pixel_acc {metrics['pixel_acc']:.4f} "
              f"mean_acc {metrics['mean_acc']:.4f} "
              f"mIoU {metrics['mean_iou']:.4f} fwIoU {metrics['fw_iou']:.4f}")
    else:
        paths = test_seg.test(apply_fn, variables, loader, args.out,
                              num_classes=cfg.dataset.num_classes,
                              scales=(1.0,), flip=cfg.test.flip_test,
                              crop_size=(size[1], size[0]), mesh=mesh)
        print(f"wrote {len(paths)} parsing PNGs to {args.out}")


if __name__ == "__main__":
    main()
