"""Export an npp_tpu checkpoint back to a reference (GuHuangAI/NPP)
torch ``.pth`` state_dict — the inverse of ``tools/convert_checkpoint.py``.

Accepts an orbax directory holding either bare variables
(``{'params', 'batch_stats'}`` — the convert CLI's output), a saved
``TrainState``/``SearchState`` (the training CLIs' checkpoints; the
model subtree is extracted), or a ``{'state': ...}`` wrapper. Builds the
reference ``Network`` at the config's scale as the name/shape template
(the reference repo must be importable — ``--reference-repo``) and
writes a ``torch.save``-d state_dict the reference's own load paths
accept (augment_lip_sync.py:222-231).

Fused-neck variables are unfused automatically; vmapped fusion layouts
(search checkpoints) are unrolled automatically.

Examples:
  python tools/export_checkpoint.py --ckpt out/checkpoints/best \
      --out model_best.pth --cfg experiments/lip/384_384.yaml
  python tools/export_checkpoint.py --ckpt search_out/warmed \
      --out warmed_state.pth --cfg experiments/lip/384_384.yaml --search
"""
from __future__ import annotations

import argparse
import os
import sys
from types import SimpleNamespace as NS

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def extract_variables(tree) -> dict:
    """Pull ``{'params', 'batch_stats'}`` (model subtrees) out of any of
    the supported checkpoint layouts."""
    if isinstance(tree.get("state"), dict):
        tree = tree["state"]
    params = tree["params"]
    if isinstance(params, dict) and "model" in params:
        params = params["model"]  # TrainState/SearchState layout
    return {"params": params, "batch_stats": tree["batch_stats"]}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt", required=True, help="orbax checkpoint dir")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--search", action="store_true",
                   help="checkpoint is a supernet (SearchNet)")
    p.add_argument("--reference-repo", default="/root/reference",
                   help="path to the reference repo (for the template)")
    args = p.parse_args()

    sys.path.insert(0, args.reference_repo)

    import numpy as np
    import orbax.checkpoint as ocp
    import torch

    from npp_tpu.config import load_config

    cfg = load_config(args.cfg)
    # CheckpointManager epoch saves nest the pytree one level down
    # (<epoch>/default/); named mirrors (best/warmed/final) and the
    # convert CLI's output are flat.
    ckpt_dir = args.ckpt
    nested = os.path.join(ckpt_dir, "default")
    if os.path.isdir(nested):
        ckpt_dir = nested
    tree = ocp.PyTreeCheckpointer().restore(ckpt_dir)
    variables = extract_variables(tree)

    if args.search:
        from models.model_search_interact import Network  # reference

        from npp_tpu.utils.torch_convert import (
            convert_fusion_layout, convert_injection_layout,
            export_reference_search_state_dict)

        ref_cfg = NS(DATASET=NS(NUM_CLASSES=cfg.dataset.num_classes,
                                NUM_JOINTS=cfg.dataset.num_joints),
                     SEARCH=NS(LAYERS=cfg.search.layers,
                               INIT_CHANNELS=cfg.search.init_channels),
                     MODEL=NS(HEAD="",
                              REFINE_LAYERS=cfg.model.refine_layers))
        stacked = any("step_ops_0" in v
                      for k, v in variables["params"].items()
                      if k.startswith(("pose_net_", "par_net_")))
        if stacked:
            variables = {c: convert_fusion_layout(t, to_vmapped=False)
                         for c, t in variables.items()}
        if "inj_diag_0" in variables["params"]:
            variables = {c: convert_injection_layout(t, to_vmapped=False)
                         for c, t in variables.items()}
        template = Network(ref_cfg).state_dict()
        out_sd, counts = export_reference_search_state_dict(
            variables, {k: v.numpy() for k, v in template.items()})
    else:
        from models.model_augment import Network  # reference

        from npp_tpu.models.augment import unfuse_neck_variables
        from npp_tpu.utils.torch_convert import export_reference_state_dict

        ref_cfg = NS(DATASET=NS(NUM_CLASSES=cfg.dataset.num_classes,
                                NUM_JOINTS=cfg.dataset.num_joints),
                     TRAIN=NS(LAYERS=cfg.train.layers,
                              INIT_CHANNELS=cfg.train.init_channels),
                     MODEL=NS(DECONV_WITH_BIAS=False, HEAD="",
                              REFINE_LAYERS=cfg.model.refine_layers))
        if "neck1" in variables["params"]:
            variables = unfuse_neck_variables(variables)
        template = Network(ref_cfg).state_dict()
        out_sd, counts = export_reference_state_dict(
            variables, {k: v.numpy() for k, v in template.items()})

    # .copy() yields contiguous arrays while preserving 0-d shapes
    # (np.ascontiguousarray would promote num_batches_tracked to 1-d).
    torch.save({k: torch.from_numpy(np.asarray(v).copy())
                for k, v in out_sd.items()}, args.out)
    print(f"exported {counts} -> {args.out}")


if __name__ == "__main__":
    main()
