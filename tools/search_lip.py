"""NAS interaction-search CLI (bi-level DARTS).

TPU-native equivalent of reference ``search_lip_sync.py``: weight-only
warmup epochs, then alternating weight/arch steps over zipped train/mini
loaders, per-epoch genotype extraction and coupled (mIoU, PCKh) best-model
tracking.

Examples:
  python tools/search_lip.py --cfg experiments/lip/384_384.yaml
  python tools/search_lip.py --cfg experiments/lip/384_384.yaml \
      --synthetic --steps 2 --tiny --epochs 1
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def parse_args():
    p = argparse.ArgumentParser(description="Search NPPNet interactions")
    p.add_argument("--cfg", required=True)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--steps", type=int, default=0)
    p.add_argument("--epochs", type=int, default=0)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--warmup-epochs", type=int, default=-1,
                   help="override warmup (reference hard-codes 15)")
    p.add_argument("--merged-streams", action="store_true",
                   help="run encoder cell pairs as vmapped stream pairs "
                        "(fastest measured bi-level step + smallest cold "
                        "compile; checkpoints use the merged layout — "
                        "convert with unmerge_stream_variables)")
    p.add_argument("--zero", action="store_true",
                   help="ZeRO-1: shard both Adam moment trees over the "
                        "data axis (parallel/zero.py)")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p.parse_args()


def main():
    args = parse_args()
    from npp_tpu import engine
    from npp_tpu.config import load_config
    from npp_tpu.core import evaluate as E
    from npp_tpu.core import search as S
    from npp_tpu.core.checkpoint import CheckpointManager
    from npp_tpu.core.criterion import (LIP_CLASS_WEIGHTS,
                                        PASCAL_CLASS_WEIGHTS)
    from npp_tpu.data.assets import resolve_pose_gt_csv
    from npp_tpu.data import (DataLoader, LIPDataset, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.models import genotype_parse as GP
    from npp_tpu.models.search import build_search_model
    from npp_tpu.parallel.mesh import (batch_sharding,
                                       initialize_distributed, make_mesh,
                                       replicate)
    from npp_tpu.utils.logging_utils import MetricWriter, create_logger
    from tools.augment_lip import _LimitedLoader

    initialize_distributed()
    cfg = load_config(args.cfg)
    if args.tiny:
        cfg = load_config(args.cfg, overrides={
            "SEARCH": {"LAYERS": 8, "INIT_CHANNELS": 8, "BATCH_SIZE": 2}})
    logger, out_dir, tb_dir = create_logger(cfg, args.cfg, "search")
    writer = MetricWriter(tb_dir)
    mesh = make_mesh()
    logger.info(f"devices: {jax.devices()}")

    size = (128, 128) if args.tiny else tuple(cfg.model.image_size)
    # uint8 transfer + fused on-device normalization (see augment_lip.py).
    renderer = make_target_renderer(stride=4, sigma=cfg.model.sigma,
                                    num_joints=cfg.dataset.num_joints,
                                    ignore=cfg.train.ignore_label,
                                    normalize_images=True)
    sharding = batch_sharding(mesh)
    bs = cfg.search.batch_size
    if args.synthetic:
        mk = lambda n, seed, train: SyntheticDataset(
            length=n, crop_size=size, num_joints=cfg.dataset.num_joints,
            num_classes=cfg.dataset.num_classes, seed=seed, is_train=train,
            device_normalize=True)
        train_ds, mini_ds = mk(8 * bs, 0, True), mk(8 * bs, 1, True)
        val_ds = mk(2 * bs, 2, False)
    else:
        root = cfg.dataset.root
        mk = lambda anno, train, sample=-1, inv=False: LIPDataset(
            root, cfg.dataset.train_imroot if train
            else cfg.dataset.val_imroot, anno,
            cfg.dataset.train_segroot if train else cfg.dataset.val_segroot,
            crop_size=size, sigma=cfg.model.sigma, is_train=train,
            sample=sample, inv_order=inv, device_normalize=True)
        train_ds = mk(cfg.search.train_set, True)
        mini_ds = mk(cfg.search.mini_set, True)
        val_ds = mk(cfg.search.test_set, False, sample=5000)

    train_loader = DataLoader(train_ds, bs, shuffle=True,
                              num_workers=cfg.workers, sharding=sharding,
                              renderer=renderer)
    mini_loader = DataLoader(mini_ds, bs, shuffle=True, seed=1,
                             num_workers=cfg.workers, sharding=sharding,
                             renderer=renderer)
    val_loader = DataLoader(val_ds, bs, shuffle=False,
                            num_workers=cfg.workers, sharding=sharding,
                            renderer=renderer, drop_last=False)
    if args.steps:
        train_loader = _LimitedLoader(train_loader, args.steps)
        mini_loader = _LimitedLoader(mini_loader, args.steps)
        val_loader = _LimitedLoader(val_loader, max(1, args.steps // 2))

    model = build_search_model(cfg, merged_streams=args.merged_streams)
    steps_per_epoch = max(1, len(train_loader))
    w_tx, a_tx = S.make_search_optimizers(
        w_lr=cfg.search.w_lr, alpha_lr=cfg.search.alpha_lr,
        lr_step=cfg.search.lr_step, lr_factor=cfg.search.lr_factor,
        steps_per_epoch=steps_per_epoch,
        alpha_weight_decay=0.001)
    # Init at a small spatial size: conv/BN param shapes are independent of
    # H/W, and the full-resolution init program alone is expensive to
    # compile at reference scale.
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    num_stages = cfg.model.refine_layers + 1
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0),
                                sample, num_stages)
    if args.zero:
        from npp_tpu.parallel.zero import (SEARCH_OPT_FIELDS,
                                           shard_state_zero)

        state = shard_state_zero(state, mesh, fields=SEARCH_OPT_FIELDS)
    else:
        state = replicate(state, mesh)
    logger.info("search state initialized")

    class_weights = (LIP_CLASS_WEIGHTS if cfg.dataset.dataset == "lip"
                     else PASCAL_CLASS_WEIGHTS)
    weight_step, arch_step = S.make_search_steps(
        model, w_tx, a_tx, class_weights=class_weights,
        ignore_index=cfg.train.ignore_label,
        ohem_thres=cfg.loss.ohem_thres, ohem_keep=cfg.loss.ohem_keep,
        use_target_weight=cfg.loss.use_target_weight,
        zero_mesh=mesh if args.zero else None)
    flip_pairs = (((14, 15), (16, 17), (18, 19))
                  if cfg.dataset.dataset == "lip" else ())
    eval_step = E.make_eval_step(
        model, num_classes=cfg.dataset.num_classes,
        class_weights=class_weights, flip_test=True,
        ignore_index=cfg.train.ignore_label, flip_pairs=flip_pairs,
        decode_hw=(size[1], size[0]))

    ckpt = CheckpointManager(os.path.join(out_dir, "checkpoints"))
    begin_epoch = 0
    best_iou = best_pck = 0.0
    best_genotype = None
    if args.resume:
        try:
            restored, meta = ckpt.restore(state)
        except Exception as e:
            raise SystemExit(
                "resume failed — if this checkpoint predates the vmapped "
                "injection layout (round-4 default), migrate it with "
                "npp_tpu.utils.torch_convert.convert_injection_layout"
                "(tree, to_vmapped=True) per collection (MIGRATION.md "
                "supernet layout note); original error: " + repr(e))
        if restored is not None:
            state = restored
            begin_epoch = int(meta["epoch"]) + 1
            best_iou = float(meta.get("best_iou", 0.0))
            best_pck = float(meta.get("best_pck", 0.0))
            logger.info(f"resumed from epoch {meta['epoch']}")

    warmup = (args.warmup_epochs if args.warmup_epochs >= 0
              else cfg.search.warmup_epochs)
    epochs = args.epochs or cfg.search.epochs
    gstep = 0
    for epoch in range(begin_epoch, epochs):
        train_loader.set_epoch(epoch)
        mini_loader.set_epoch(epoch)
        if epoch < warmup:
            # Weight-only warmup uses the weight step alone.
            for i, batch in enumerate(train_loader):
                batch = {k: v for k, v in batch.items() if k != "names"}
                state, m = weight_step(state, batch)
                if i % cfg.print_freq == 0:
                    logger.info(f"warmup [{epoch}][{i}] "
                                f"loss {float(m['loss']):.4f}")
        else:
            state, _, gstep = engine.search_epoch(
                weight_step, arch_step, state, train_loader, mini_loader,
                epoch=epoch, entropy_epoch=cfg.search.entropy_epoch,
                logger=logger, writer=writer, print_freq=cfg.print_freq,
                global_step=gstep)

        # Synthetic smoke runs skip PCKh (names don't match the GT rows).
        gt_csv = (None if args.synthetic
                  else resolve_pose_gt_csv(cfg.pose_gt_path))
        result = E.validate(eval_step, state.params, state.batch_stats,
                            val_loader, num_classes=cfg.dataset.num_classes,
                            gt_csv=gt_csv,
                            pred_csv=os.path.join(out_dir, "pose_pred.csv")
                            if gt_csv else None,
                            log_fn=logger.info)
        miou = result["mean_iou"]
        pck = result.get("pck_avg", 0.0)
        genotype = GP.extract_genotype(S.get_arch_params(state))
        logger.info(f"epoch {epoch}: mIoU {miou:.4f} PCKh {pck:.2f}")
        logger.info(f"genotype = {genotype}")
        is_best = engine.is_best_checkpoint(miou, pck, best_iou, best_pck)
        if is_best:
            best_iou, best_pck = miou, pck
            best_genotype = genotype
            from npp_tpu.genotypes import save_genotypes

            save_genotypes(os.path.join(out_dir, "best_genotype.json"),
                           genotype[0], genotype[1],
                           meta={"epoch": epoch, "miou": miou, "pck": pck})
        ckpt.save(epoch, state,
                  metrics={"best_iou": best_iou, "best_pck": best_pck},
                  is_best=is_best,
                  tag=("warmed" if epoch == warmup - 1 else
                       "final" if epoch == epochs - 1 else None))
    ckpt.wait()  # drain async epoch saves before exit
    logger.info(f"final best mIoU {best_iou:.4f} best PCKh {best_pck:.2f}")
    logger.info(f"best genotype = {best_genotype}")
    if best_genotype is not None:
        logger.info(f"saved to {os.path.join(out_dir, 'best_genotype.json')}")
    writer.close()


if __name__ == "__main__":
    main()
