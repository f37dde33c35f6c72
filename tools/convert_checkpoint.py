"""Migrate a reference (GuHuangAI/NPP) torch checkpoint to npp_tpu.

Reads a ``.pth`` file holding either a bare ``state_dict`` or the
reference's epoch-checkpoint dict (``checkpoint.pth`` with
``best_state_dict``/``state_dict`` keys, search_lip_sync.py:360-371),
converts every conv/BN leaf (plus alphas/betas for search checkpoints)
into flax variables, and writes an orbax checkpoint restorable by the
npp_tpu CLIs.

Examples:
  # fixed-architecture (augment) checkpoint -> NPPNet variables
  python tools/convert_checkpoint.py --pth final_state.pth \
      --out /ckpt/npp_tpu_final --cfg experiments/lip/384_384.yaml

  # supernet (search) checkpoint -> SearchNet variables (vmapped layout)
  python tools/convert_checkpoint.py --pth warmed_state.pth \
      --out /ckpt/search_warmed --cfg experiments/lip/384_384.yaml --search
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def extract_state_dict(obj):
    """Accept a bare state_dict or a reference checkpoint dict
    (checkpoint.pth holds epoch/optimizer/... plus the weights under
    best_state_dict / state_dict, search_lip_sync.py:360-371)."""
    for key in ("best_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and isinstance(obj.get(key), dict):
            obj = obj[key]
            break
    # strip DDP 'module.' prefixes
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in obj.items()}


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True, help="reference .pth file")
    p.add_argument("--out", required=True, help="output orbax directory")
    p.add_argument("--cfg", required=True, help="experiment YAML")
    p.add_argument("--search", action="store_true",
                   help="checkpoint is a supernet (model_search_interact)")
    args = p.parse_args()

    import torch  # CPU load only

    import orbax.checkpoint as ocp

    from npp_tpu.config import load_config

    cfg = load_config(args.cfg)
    obj = torch.load(args.pth, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in extract_state_dict(obj).items()}

    if args.search:
        from npp_tpu.models.search import SearchNet
        from npp_tpu.utils.torch_convert import (
            convert_reference_search_state_dict, search_unrolled_to_default)

        model = SearchNet(num_classes=cfg.dataset.num_classes,
                          num_joints=cfg.dataset.num_joints,
                          layers=cfg.search.layers,
                          init_channels=cfg.search.init_channels,
                          refine_layers=cfg.model.refine_layers,
                          vmap_fusion=False, vmap_injections=False,
                          remat=False, dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             dict(variables))
        converted, counts = convert_reference_search_state_dict(sd, zeros)
        converted = search_unrolled_to_default(
            {"params": converted["params"],
             "batch_stats": converted["batch_stats"]})
    else:
        from npp_tpu.models.augment import NPPNet
        from npp_tpu.utils.torch_convert import (
            convert_reference_state_dict)

        model = NPPNet(num_classes=cfg.dataset.num_classes,
                       num_joints=cfg.dataset.num_joints,
                       layers=cfg.train.layers,
                       init_channels=cfg.train.init_channels,
                       refine_layers=cfg.model.refine_layers,
                       dtype=jnp.float32)
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), train=False))
        zeros = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                             dict(variables))
        converted, counts = convert_reference_state_dict(sd, zeros)
        converted = {"params": converted["params"],
                     "batch_stats": converted["batch_stats"]}

    # Save as numpy leaves: restorable with a bare PyTreeCheckpointer
    # (no sharding spec needed), then device_put by the consumer.
    import numpy as np

    converted = jax.tree.map(lambda a: np.asarray(a), converted)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(args.out, converted, force=True)
    print(f"converted {counts} -> {args.out}")


if __name__ == "__main__":
    main()
