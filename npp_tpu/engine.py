"""Epoch-level training/search drivers shared by the CLIs.

The per-epoch control flow of reference ``core/function.py`` ``train``
(:57-147) / ``train_with_alpha`` (:485-625) and the entry scripts'
epoch loops (search_lip_sync.py:317-394, augment_lip_sync.py:238-287),
re-expressed around jitted SPMD steps.
"""
from __future__ import annotations

import time

from npp_tpu.utils.logging_utils import AverageMeter


def train_epoch(train_step, state, loader, *, epoch: int, logger=None,
                writer=None, print_freq: int = 100, global_step: int = 0):
    """One weight-training epoch (core/function.py:57-147).

    Metrics stay on device between log points: fetching a scalar every
    step forces a device round-trip per iteration (a full RPC on remote
    runtimes) and serializes dispatch, so the loss is accumulated as a
    device array and only materialized every ``print_freq`` steps."""
    ave_loss = AverageMeter()
    tic = time.time()
    loss_sum = None
    n_pending = 0
    for i_iter, batch in enumerate(loader):
        batch = {k: v for k, v in batch.items() if k != "names"}
        state, metrics = train_step(state, batch)
        loss_sum = (metrics["loss"] if loss_sum is None
                    else loss_sum + metrics["loss"])
        n_pending += 1
        if i_iter % print_freq == 0:
            ave_loss.update(float(loss_sum) / n_pending, n=n_pending)
            loss_sum, n_pending = None, 0
            if logger:
                logger.info(
                    f"Epoch: [{epoch}][{i_iter}/{len(loader)}] "
                    f"Loss: {ave_loss.average():.6f} "
                    f"(pose {float(metrics['loss_pose']):.4f} "
                    f"par {float(metrics['loss_par']):.4f}) "
                    f"{time.time() - tic:.2f}s")
                tic = time.time()
            if writer is not None:
                writer.scalar("train_loss", ave_loss.average(), global_step)
                global_step += 1
    if n_pending:
        ave_loss.update(float(loss_sum) / n_pending, n=n_pending)
    return state, ave_loss.average(), global_step


def train_epoch_scanned(multi_step, state, loader, *, epoch: int,
                        steps_per_dispatch: int = 8, logger=None,
                        writer=None, global_step: int = 0):
    """train_epoch with K steps fused into one device dispatch.

    Collects ``steps_per_dispatch`` loader batches, stacks them on a
    leading axis, and runs ``multi_step`` (``make_train_step_scanned``)
    once — one launch per K steps instead of K. A short tail chunk
    simply runs the per-step count it has (one extra program per
    distinct tail size; pick ``steps_per_dispatch`` dividing the epoch
    length to avoid it). Logs once per dispatch."""
    import jax.numpy as jnp

    ave_loss = AverageMeter()
    tic = time.time()
    chunk: list = []
    i_iter = 0

    def dispatch(state, chunk, i_iter, global_step):
        stacked = {k: jnp.stack([b[k] for b in chunk])
                   for k in chunk[0] if k != "names"}
        state, metrics = multi_step(state, stacked)
        mean_loss = float(jnp.mean(metrics["loss"]))
        ave_loss.update(mean_loss, n=len(chunk))
        if logger:
            logger.info(
                f"Epoch: [{epoch}][{i_iter}/{len(loader)}] "
                f"Loss: {ave_loss.average():.6f} "
                f"({len(chunk)} steps/dispatch) "
                f"{time.time() - tic:.2f}s")
        if writer is not None:
            writer.scalar("train_loss", ave_loss.average(), global_step)
            global_step += 1
        return state, global_step

    for batch in loader:
        chunk.append(batch)
        i_iter += 1
        if len(chunk) == steps_per_dispatch:
            state, global_step = dispatch(state, chunk, i_iter, global_step)
            chunk = []
            tic = time.time()
    if chunk:
        state, global_step = dispatch(state, chunk, i_iter, global_step)
    return state, ave_loss.average(), global_step


def search_epoch(weight_step, arch_step, state, train_loader, mini_loader,
                 *, epoch: int, entropy_epoch: int = 70, logger=None,
                 writer=None, print_freq: int = 100, global_step: int = 0):
    """One bi-level epoch: weight step on the train batch then arch step on
    the mini batch (core/function.py:485-625). Losses accumulate on device
    and are fetched only at ``print_freq`` boundaries (see train_epoch)."""
    import jax.numpy as jnp

    ave_loss = AverageMeter()
    entropy_coef = jnp.float32(1.0 if epoch > entropy_epoch else 0.0)
    n = min(len(train_loader), len(mini_loader))
    loss_sum = None
    n_pending = 0
    for i_iter, (b1, b2) in enumerate(zip(train_loader, mini_loader)):
        b1 = {k: v for k, v in b1.items() if k != "names"}
        b2 = {k: v for k, v in b2.items() if k != "names"}
        state, m1 = weight_step(state, b1)
        state, m2 = arch_step(state, b2, entropy_coef)
        loss_sum = m1["loss"] if loss_sum is None else loss_sum + m1["loss"]
        n_pending += 1
        if i_iter % print_freq == 0:
            ave_loss.update(float(loss_sum) / n_pending, n=n_pending)
            loss_sum, n_pending = None, 0
            if logger:
                logger.info(
                    f"Search epoch [{epoch}][{i_iter}/{n}] "
                    f"w-loss {float(m1['loss']):.4f} "
                    f"a-loss {float(m2['loss']):.4f} "
                    f"entropy {float(m2['entropy']):.4f}")
            if writer is not None:
                writer.scalar("train_loss", ave_loss.average(), global_step)
                global_step += 1
    if n_pending:
        ave_loss.update(float(loss_sum) / n_pending, n=n_pending)
    return state, ave_loss.average(), global_step


def is_best_checkpoint(mean_iou: float, pck_avg: float, best_iou: float,
                       best_pck: float) -> bool:
    """Coupled best-model criterion (search_lip_sync.py:338-353)."""
    if best_iou < mean_iou:
        return best_pck - 1 < pck_avg
    return best_pck + 1 < pck_avg
