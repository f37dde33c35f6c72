"""Orbax checkpointing of train/search state.

TPU-native replacement for the reference's torch checkpoint files
(search_lip_sync.py:357-394: ``checkpoint.pth`` each epoch with model +
both optimizers + criterion lambdas + metrics, ``model_best.pth`` on
improvement, ``warmed_state.pth`` at the end of warmup,
``final_state.pth`` at the end): one orbax CheckpointManager per run dir
with named save points; free-form metrics ride in sidecar JSON. The
reference's hard-coded absolute resume paths (SURVEY.md §8) become
run-dir-relative management.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def _named_dir(self, name: str) -> str:
        return os.path.join(self.directory, name)

    def _meta_path(self, where: str) -> str:
        return os.path.join(where, "meta.json")

    def save(self, epoch: int, state: Any, metrics: Optional[dict] = None,
             is_best: bool = False, tag: Optional[str] = None) -> None:
        """Save epoch checkpoint; optionally mirror to best/warmed/final.

        The plain epoch save is ASYNC (orbax snapshots to host, then
        writes in the background while the next epoch trains); named
        mirrors and `wait()` are synchronous barriers."""
        meta = {"epoch": int(epoch), **(metrics or {})}
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        # Orbax coordinates the array writes itself (primary-host only);
        # the sidecar/metadata host files are process-0-only, like the
        # reference's rank-0 checkpointing (search_lip_sync.py:357-394) —
        # every process still CALLS save (the orbax ops are collective).
        if jax.process_index() == 0:
            with open(os.path.join(self.directory, f"meta_{epoch}.json"),
                      "w") as f:
                json.dump(meta, f)
        if is_best:
            self._save_named(self._named_dir("best"), state, meta)
        if tag in ("warmed", "final"):
            self._save_named(self._named_dir(tag), state, meta)

    def wait(self) -> None:
        """Block until in-flight async epoch saves hit disk (call before
        process exit or reading the epoch checkpoint back)."""
        self._mgr.wait_until_finished()

    def _save_named(self, path: str, state, meta) -> None:
        primary = jax.process_index() == 0
        if primary and os.path.exists(path):
            shutil.rmtree(path)
        if jax.process_count() > 1:
            # Everyone waits for the primary's cleanup before the
            # collective save touches the path.
            from jax.experimental import multihost_utils
            multihost_utils.sync_global_devices("ckpt_named_rm:" + path)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state)
        ckptr.wait_until_finished()
        if primary:
            with open(self._meta_path(path), "w") as f:
                json.dump(meta, f)

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, epoch: Optional[int] = None):
        """Restore (state, meta). ``state_template`` provides the pytree
        structure/shardings (like load_state_dict's target module)."""
        self._mgr.wait_until_finished()  # async saves may be in flight
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        state = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        meta_file = os.path.join(self.directory, f"meta_{step}.json")
        meta = (json.load(open(meta_file)) if os.path.isfile(meta_file)
                else {"epoch": int(step)})
        return state, meta

    def restore_named(self, state_template: Any, name: str = "best"):
        path = self._named_dir(name)
        if not os.path.exists(path):
            return None, None
        ckptr = ocp.StandardCheckpointer()
        state = ckptr.restore(path, state_template)
        meta_file = self._meta_path(path)
        meta = (json.load(open(meta_file)) if os.path.isfile(meta_file)
                else {})
        return state, meta


def load_pretrained_params(params_template, pretrained_params,
                           log_fn=print):
    """Shape-tolerant pretrained-weight merge
    (model_augment.py:673-709): keys present in both with matching shapes
    are taken from the pretrained tree; everything else keeps the template
    value."""
    flat_t = dict(jax.tree_util.tree_flatten_with_path(params_template)[0])
    flat_p = dict(jax.tree_util.tree_flatten_with_path(pretrained_params)[0])
    merged = {}
    n_loaded = n_skipped = 0
    for path, tval in flat_t.items():
        pval = flat_p.get(path)
        if pval is not None and np.shape(pval) == np.shape(tval):
            merged[path] = pval
            n_loaded += 1
        else:
            if pval is not None:
                log_fn(f"skip {jax.tree_util.keystr(path)}: "
                       f"shape {np.shape(pval)} != {np.shape(tval)}")
                n_skipped += 1
            merged[path] = tval
    treedef = jax.tree_util.tree_structure(params_template)
    leaves = [merged[p] for p, _ in
              jax.tree_util.tree_flatten_with_path(params_template)[0]]
    log_fn(f"pretrained merge: {n_loaded} loaded, {n_skipped} shape-skipped")
    return jax.tree_util.tree_unflatten(treedef, leaves)
