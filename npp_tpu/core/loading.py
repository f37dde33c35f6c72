"""Shared eval-time CLI loading: config + fixed model + checkpoint.

The test/serve CLIs (tools/test_lip.py, tools/predict.py) all need the
same preamble — load the experiment YAML (with the --tiny smoke
override), build the fixed NPPNet, init variables at a small spatial
size (conv/BN param shapes are H/W-independent), and restore the best
(falling back to the latest) checkpoint into eval variables. One
implementation so a checkpoint-layout or override change lands
everywhere at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def load_eval_model(cfg_path: str, ckpt: str = "", tiny: bool = False,
                    genotype: str = "", log_fn=print):
    """Returns ``(cfg, model, variables, size)`` ready for inference.

    ``size`` is the eval crop ``(width, height)`` — the config's
    ``MODEL.IMAGE_SIZE``, or 128x128 under ``tiny``. With ``ckpt`` empty
    the variables are a fresh init (synthetic smoke only). ``genotype``
    is an optional searched-genotype JSON (a search run's
    best_genotype.json); the fixed net — and hence the checkpoint param
    tree — is built from it instead of the released genotypes, closing
    the search -> augment -> serve loop (reference README.md:13-24)."""
    from npp_tpu.config import load_config
    from npp_tpu.core import train as T
    from npp_tpu.core.checkpoint import CheckpointManager
    from npp_tpu.models.augment import build_model

    cfg = load_config(cfg_path)
    if tiny:
        cfg = load_config(cfg_path, overrides={
            "TRAIN": {"LAYERS": 8, "INIT_CHANNELS": 8}})
    size = (128, 128) if tiny else tuple(cfg.model.image_size)

    inter = fusion = None
    if genotype:
        from npp_tpu.genotypes import load_genotypes

        inter, fusion = load_genotypes(genotype)
        log_fn(f"building model from searched genotypes: {genotype}")
    model = build_model(cfg, inter=inter, fusion=fusion)
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), sample, train=False)
    if ckpt:
        tx = T.make_train_optimizer(1e-3, (1,), 0.1, 1)
        template = T.init_train_state(model, tx, jax.random.PRNGKey(0),
                                      sample, cfg.model.refine_layers + 1)
        state, meta = CheckpointManager(ckpt).restore_named(template, "best")
        if state is None:
            state, meta = CheckpointManager(ckpt).restore(template)
        assert state is not None, f"no checkpoint in {ckpt}"
        variables = {"params": state.params["model"],
                     "batch_stats": state.batch_stats}
        log_fn(f"loaded checkpoint meta: {meta}")
    return cfg, model, variables, size
