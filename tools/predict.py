"""Serving CLI: raw images in, parsing PNGs + LIP keypoint CSV out.

The user-facing face of ``npp_tpu.core.predictor.Predictor`` — the
working replacement for the reference's bit-rotted ``utils/eval_util.py``
demo flow (single/multi-image TTA testing). Streams a directory (or
glob) of images through the prefetch-threaded predictor and writes
``<stem>.png`` palette parsings plus one ``pose_pred.csv`` in the LIP
protocol (same format the eval engine and the reference's
``pred_keypoints_lip.csv`` use).

Serves the measured-best configuration by default: bf16 with both exact
graph fusions (``fuse_necks`` + ``fuse_cells`` — BENCH.md serving
matrix: 384 img/s at p50 6.57 ms on one v5e chip). ``--no-fuse``
disables both.

Examples:
  # serve a folder with a converted reference checkpoint
  python tools/predict.py --cfg experiments/lip/384_384.yaml \
      --ckpt converted_ckpt --images demo_imgs/ --out preds/
  # int8 serving without the graph fusions, batch 16
  python tools/predict.py --cfg experiments/lip/384_384.yaml \
      --ckpt converted_ckpt --images 'demo_imgs/*.jpg' --out preds/ \
      --int8 --no-fuse --batch 16
  # synthetic smoke (fresh init, tiny net)
  python tools/predict.py --cfg experiments/lip/384_384.yaml \
      --synthetic 4 --tiny --out preds/
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _parse_pose_scales(spec: str) -> tuple:
    """Parse the --pose-scales comma list: tolerate stray whitespace /
    trailing commas, dedupe (a duplicate entry would silently
    double-weight that scale in the uniform TTA average), and name the
    flag on parse errors."""
    scales: list = []
    for tok in spec.split(","):
        tok = tok.strip()
        if not tok:
            continue
        try:
            val = float(tok)
        except ValueError:
            raise SystemExit(
                f"--pose-scales: {tok!r} is not a number "
                f"(expected e.g. 0.8,1.0,1.2)")
        if val not in scales:
            scales.append(val)
    if not scales:
        raise SystemExit("--pose-scales: no scales given")
    return tuple(scales)


def _gather_images(spec: str) -> list[str]:
    if os.path.isdir(spec):
        paths = sorted(
            p for p in glob.glob(os.path.join(spec, "*"))
            if p.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    else:
        paths = sorted(glob.glob(spec))
    if not paths:
        raise SystemExit(f"no images match {spec!r}")
    return paths


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", required=True)
    p.add_argument("--ckpt", default="",
                   help="checkpoint dir (empty = fresh init, smoke only)")
    p.add_argument("--images", default="",
                   help="image directory or glob")
    p.add_argument("--out", default="predictions")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="serve dense convs as int8 MXU ops")
    p.add_argument("--fuse-necks", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="serve through the fused-neck graph (exact; "
                        "on by default — part of the measured-best config)")
    p.add_argument("--fuse-cells", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="merge same-input sibling convs inside cells into "
                        "K-wide convs (exact; on by default — part of the "
                        "measured-best config, BENCH.md serving matrix)")
    p.add_argument("--no-fuse", action="store_true",
                   help="disable BOTH exact graph fusions (shorthand for "
                        "--no-fuse-necks --no-fuse-cells)")
    p.add_argument("--no-flip", action="store_true",
                   help="disable flip TTA")
    p.add_argument("--dark", action="store_true",
                   help="DARK sub-pixel keypoint decode "
                        "(arXiv:1910.06278; more accurate than the "
                        "reference quarter-offset)")
    p.add_argument("--pose-scales", default="",
                   help="comma list of scale multipliers for scale-list "
                        "pose TTA, e.g. 0.8,1.0,1.2 (must include 1.0; "
                        "the working version of the reference's "
                        "eval_util.py multi-scale pose tester)")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="predict N random images instead of --images")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--genotype", default="",
                   help="searched-genotype JSON (best_genotype.json); the "
                        "net is built from it instead of the released "
                        "genotypes — must match the checkpoint")
    return p


def main():
    args = build_parser().parse_args()

    import cv2

    from npp_tpu.core.loading import load_eval_model
    from npp_tpu.core.predictor import Predictor
    from npp_tpu.utils.metrics import save_pose_csv
    from npp_tpu.utils.vis import save_parsing_png

    cfg, model, variables, size = load_eval_model(args.cfg, args.ckpt,
                                                  args.tiny,
                                                  genotype=args.genotype)

    pose_scales = (_parse_pose_scales(args.pose_scales)
                   if args.pose_scales else (1.0,))
    if args.no_fuse:
        args.fuse_necks = args.fuse_cells = False
    pred = Predictor(model, variables, crop_size=size,
                     flip_test=not args.no_flip,
                     quantize="int8" if args.int8 else None,
                     fuse_necks=args.fuse_necks,
                     fuse_cells=args.fuse_cells, dark_decode=args.dark,
                     pose_scales=pose_scales)

    if args.synthetic:
        rng = np.random.default_rng(0)
        names = [f"synthetic_{i:03d}" for i in range(args.synthetic)]
        images = [rng.integers(0, 255, (200 + 8 * (i % 3), 160, 3))
                  .astype(np.uint8) for i in range(args.synthetic)]
        image_iter = iter(images)
    else:
        paths = _gather_images(args.images)
        names = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        if len(set(names)) != len(names):
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise SystemExit(
                f"duplicate image stems would overwrite outputs: {dupes}")

        def _read():
            for path in paths:
                im = cv2.imread(path, cv2.IMREAD_COLOR)
                if im is None:
                    raise SystemExit(f"unreadable image {path}")
                yield cv2.cvtColor(im, cv2.COLOR_BGR2RGB)

        image_iter = _read()

    os.makedirs(args.out, exist_ok=True)
    all_kp = []
    for name, result in zip(names,
                            pred.predict_stream(image_iter,
                                                batch_size=args.batch)):
        save_parsing_png(result["parsing"],
                         os.path.join(args.out, f"{name}.png"),
                         num_cls=cfg.dataset.num_classes)
        all_kp.append(result["keypoints"])
    if cfg.dataset.num_joints == 16:
        save_pose_csv(names, np.stack(all_kp)[..., :2],
                      os.path.join(args.out, "pose_pred.csv"))
    print(f"wrote {len(all_kp)} parsings to {args.out}"
          + ("" if cfg.dataset.num_joints != 16 else " + pose_pred.csv"))


if __name__ == "__main__":
    main()
