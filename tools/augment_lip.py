"""Fixed-architecture training CLI (augment phase).

TPU-native equivalent of reference ``augment_lip_sync.py``: single SPMD
process drives all chips (multi-host via jax.distributed when coordinator
env vars are set) instead of one torch.distributed process per GPU.

Examples:
  python tools/augment_lip.py --cfg experiments/lip/384_384.yaml
  python tools/augment_lip.py --cfg experiments/lip/384_384.yaml \
      --synthetic --steps 2 --tiny     # smoke run without the LIP archive
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train NPPNet (augment phase)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", action="store_true",
                   help="use synthetic data (no LIP archive needed)")
    p.add_argument("--steps", type=int, default=0,
                   help="limit steps per epoch (0 = full)")
    p.add_argument("--epochs", type=int, default=0,
                   help="override number of epochs (0 = config)")
    p.add_argument("--tiny", action="store_true",
                   help="scale the model down for smoke tests")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--pretrained-encoder", default="",
                   help="orbax dir of a pretrained search state to merge")
    p.add_argument("--steps-per-dispatch", type=int, default=1,
                   help="fuse K train steps into one device dispatch "
                        "(lax.scan; fewer launches when the host outruns "
                        "dispatch)")
    p.add_argument("--zero", action="store_true",
                   help="ZeRO-1: shard optimizer moments over the data "
                        "axis (parallel/zero.py); frees ~2 param copies "
                        "per chip at one update all-gather per step")
    p.add_argument("--fast-aug", action="store_true",
                   help="use the native fused-warp augmentation path")
    p.add_argument("--genotype", default="",
                   help="genotype JSON from a search run (best_genotype.json)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def build_loaders(cfg, args, mesh):
    from npp_tpu.data.assets import resolve_pose_gt_csv
    from npp_tpu.data import (DataLoader, LIPDataset, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.parallel.mesh import batch_sharding

    size = (128, 128) if args.tiny else tuple(cfg.model.image_size)
    # Images ship to the TPU as raw uint8 (4x fewer bytes over PCIe/tunnel)
    # and the ImageNet normalization runs fused in the device-side target
    # renderer.
    renderer = make_target_renderer(stride=4, sigma=cfg.model.sigma,
                                    num_joints=cfg.dataset.num_joints,
                                    ignore=cfg.train.ignore_label,
                                    normalize_images=True)
    sharding = batch_sharding(mesh)
    if args.synthetic:
        train_ds = SyntheticDataset(length=max(4 * cfg.train.batch_size, 32),
                                    crop_size=size,
                                    num_joints=cfg.dataset.num_joints,
                                    num_classes=cfg.dataset.num_classes,
                                    device_normalize=True)
        val_ds = SyntheticDataset(length=2 * cfg.train.batch_size,
                                  crop_size=size,
                                  num_joints=cfg.dataset.num_joints,
                                  num_classes=cfg.dataset.num_classes,
                                  is_train=False, seed=7,
                                  device_normalize=True)
    elif cfg.dataset.dataset == "ppp":
        from npp_tpu.data import PPPDataset

        root = cfg.dataset.root
        common = dict(crop_size=size, sigma=cfg.model.sigma,
                      device_normalize=True)
        train_ds = PPPDataset(root, cfg.dataset.train_imroot, "train_id.txt",
                              "PersonJoints", cfg.dataset.train_segroot,
                              "masks", is_train=True, **common)
        val_ds = PPPDataset(root, cfg.dataset.val_imroot, "val_id.txt",
                            "PersonJoints", cfg.dataset.val_segroot,
                            "masks", is_train=False,
                            sample=cfg.train.num_samples or -1, **common)
    else:
        from npp_tpu.data import FastLIPDataset

        cls = FastLIPDataset if args.fast_aug else LIPDataset
        root = cfg.dataset.root
        train_ds = cls(root, cfg.dataset.train_imroot,
                       cfg.train.train_set, cfg.dataset.train_segroot,
                       crop_size=size, sigma=cfg.model.sigma, is_train=True,
                       device_normalize=True)
        val_ds = cls(root, cfg.dataset.val_imroot, cfg.train.test_set,
                     cfg.dataset.val_segroot, crop_size=size,
                     sigma=cfg.model.sigma, is_train=False,
                     sample=cfg.train.num_samples or -1,
                     device_normalize=True)
    train_loader = DataLoader(train_ds, cfg.train.batch_size, shuffle=True,
                              num_workers=cfg.workers, sharding=sharding,
                              renderer=renderer)
    val_loader = DataLoader(val_ds, cfg.train.batch_size, shuffle=False,
                            num_workers=cfg.workers, sharding=sharding,
                            renderer=renderer, drop_last=False)
    return train_loader, val_loader, val_ds


class _LimitedLoader:
    def __init__(self, loader, limit):
        self.loader, self.limit = loader, limit

    def __len__(self):
        return min(len(self.loader), self.limit)

    def set_epoch(self, e):
        self.loader.set_epoch(e)

    def __iter__(self):
        for i, b in enumerate(self.loader):
            if i >= self.limit:
                break
            yield b


def main():
    args = parse_args()
    from npp_tpu import engine
    from npp_tpu.config import load_config
    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.checkpoint import CheckpointManager
    from npp_tpu.core.criterion import (LIP_CLASS_WEIGHTS,
                                        PASCAL_CLASS_WEIGHTS)
    from npp_tpu.models.augment import build_model
    from npp_tpu.parallel.mesh import (initialize_distributed, make_mesh,
                                       replicate)
    from npp_tpu.utils.logging_utils import MetricWriter, create_logger

    initialize_distributed()
    cfg = load_config(args.cfg)
    if args.tiny:
        cfg = load_config(args.cfg, overrides={
            "TRAIN": {"LAYERS": 8, "INIT_CHANNELS": 8, "BATCH_SIZE": 4}})
    logger, out_dir, tb_dir = create_logger(cfg, args.cfg, "augment")
    writer = MetricWriter(tb_dir)
    mesh = make_mesh()
    logger.info(f"devices: {jax.devices()}  mesh: {mesh}")

    train_loader, val_loader, val_ds = build_loaders(cfg, args, mesh)
    if args.steps:
        train_loader = _LimitedLoader(train_loader, args.steps)
        val_loader = _LimitedLoader(val_loader, max(1, args.steps // 2))

    inter = fusion = None
    if args.genotype:
        from npp_tpu.genotypes import load_genotypes

        inter, fusion = load_genotypes(args.genotype)
        logger.info(f"loaded searched genotypes from {args.genotype}")
    model = build_model(cfg, inter=inter, fusion=fusion)
    steps_per_epoch = max(1, len(train_loader))
    tx = T.make_train_optimizer(cfg.train.lr, cfg.train.lr_step,
                                cfg.train.lr_factor, steps_per_epoch)
    # Init at a small spatial size: conv/BN param shapes are independent of
    # H/W, so the expensive full-resolution init compile is unnecessary.
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    num_stages = cfg.model.refine_layers + 1
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               num_stages)
    if args.zero:
        from npp_tpu.parallel.zero import shard_state_zero

        state = shard_state_zero(state, mesh)
    else:
        state = replicate(state, mesh)
    logger.info("state initialized")

    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    begin_epoch = cfg.train.begin_epoch
    best_iou, best_pck = 0.0, 0.0
    if args.resume:
        restored, meta = ckpt.restore(state)
        if restored is not None:
            state = restored
            begin_epoch = int(meta["epoch"]) + 1
            best_iou = float(meta.get("best_iou", 0.0))
            best_pck = float(meta.get("best_pck", 0.0))
            logger.info(f"resumed from epoch {meta['epoch']}")

    if args.pretrained_encoder:
        from npp_tpu.core.checkpoint import load_pretrained_params
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        pre = ckptr.restore(args.pretrained_encoder)
        state = state.replace(params=dict(
            state.params,
            model=load_pretrained_params(state.params["model"],
                                         pre["state"]["params"]["model"],
                                         logger.info)))

    class_weights = (LIP_CLASS_WEIGHTS if cfg.dataset.dataset == "lip"
                     else PASCAL_CLASS_WEIGHTS)
    step_kw = dict(class_weights=class_weights,
                   ignore_index=cfg.train.ignore_label,
                   ohem_thres=cfg.loss.ohem_thres,
                   ohem_keep=cfg.loss.ohem_keep,
                   use_target_weight=cfg.loss.use_target_weight)
    if args.zero:
        from npp_tpu.parallel.zero import make_zero_train_step

        train_step = make_zero_train_step(
            model, tx, mesh, steps_per_dispatch=args.steps_per_dispatch,
            **step_kw)
    elif args.steps_per_dispatch > 1:
        train_step = T.make_train_step_scanned(model, tx, **step_kw)
    else:
        train_step = T.make_train_step(model, tx, **step_kw)
    is_ppp = cfg.dataset.dataset == "ppp"
    flip_pairs = () if is_ppp else ((14, 15), (16, 17), (18, 19))
    if is_ppp:
        eval_step = E.make_ppp_eval_step(
            model, num_classes=cfg.dataset.num_classes,
            class_weights=class_weights, flip_test=True,
            ignore_index=cfg.train.ignore_label)
    else:
        size = cfg.model.image_size  # (width, height)
        eval_step = E.make_eval_step(
            model, num_classes=cfg.dataset.num_classes,
            class_weights=class_weights, flip_test=True,
            ignore_index=cfg.train.ignore_label, flip_pairs=flip_pairs,
            decode_hw=(size[1], size[0]))

    epochs = args.epochs or cfg.train.epochs
    gstep = 0
    for epoch in range(begin_epoch, epochs):
        train_loader.set_epoch(epoch)
        if args.steps_per_dispatch > 1:
            state, train_loss, gstep = engine.train_epoch_scanned(
                train_step, state, train_loader, epoch=epoch,
                steps_per_dispatch=args.steps_per_dispatch,
                logger=logger, writer=writer, global_step=gstep)
        else:
            state, train_loss, gstep = engine.train_epoch(
                train_step, state, train_loader, epoch=epoch, logger=logger,
                writer=writer, print_freq=cfg.print_freq, global_step=gstep)
        if is_ppp:
            result = E.validate_ppp(
                eval_step, state.params, state.batch_stats, val_loader,
                num_classes=cfg.dataset.num_classes,
                num_joints=cfg.dataset.num_joints, log_fn=logger.info)
        else:
            # Synthetic smoke runs skip PCKh (names don't match GT rows).
            gt_csv = (None if args.synthetic
                      else resolve_pose_gt_csv(cfg.pose_gt_path))
            result = E.validate(
                eval_step, state.params, state.batch_stats, val_loader,
                num_classes=cfg.dataset.num_classes,
                gt_csv=gt_csv,
                pred_csv=os.path.join(out_dir, "pose_pred.csv")
                if gt_csv else None,
                log_fn=logger.info)
        miou = result["mean_iou"]
        pck = result.get("pck_avg", 0.0)
        logger.info(f"epoch {epoch}: loss {result['loss']:.4f} "
                    f"mIoU {miou:.4f} PCKh {pck:.2f}")
        writer.scalar("valid_mIoU", miou, epoch)
        writer.scalar("valid_loss", result["loss"], epoch)
        is_best = engine.is_best_checkpoint(miou, pck, best_iou, best_pck)
        if is_best:
            best_iou, best_pck = miou, pck
        ckpt.save(epoch, state,
                  metrics={"best_iou": best_iou, "best_pck": best_pck,
                           "mean_iou": miou, "pck": pck},
                  is_best=is_best,
                  tag="final" if epoch == epochs - 1 else None)
    ckpt.wait()  # drain async epoch saves before exit
    logger.info(f"done: best mIoU {best_iou:.4f} best PCKh {best_pck:.2f}")
    writer.close()


if __name__ == "__main__":
    main()
