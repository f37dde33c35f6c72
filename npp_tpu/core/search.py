"""Bi-level DARTS optimization: alternating weight / architecture steps.

TPU-native re-design of reference ``train_with_alpha``
(core/function.py:485-625) and the two-optimizer split
(search_lip_sync.py:273-279):
- one param tree, labeled {weights, criterion, arch} by path;
- the weight optimizer is Adam(W_LR) with criterion lambdas at 1e-4 and
  arch params frozen; the arch optimizer is Adam(ALPHA_LR, betas=(0.5,
  0.999), additive weight decay 1e-3) with everything else frozen —
  matching torch Adam's L2-style weight_decay;
- the arch loss is ``2 * (L_par + L_pose) (+ 2 * entropy)`` with the
  entropy term enabled after epoch 70 (function.py:610-617,
  search_lip_sync warmup at :317-328);
- 'find_unused_parameters=True' DDP semantics are automatic: unused params
  get zero gradients under jax.grad.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax
import jax
import jax.numpy as jnp
import optax

from npp_tpu.core import criterion
from npp_tpu.core.train import compute_losses, init_criterion_params, multistep_lr
from npp_tpu.models.genotype_parse import loss_entropy
from npp_tpu.models.search import ARCH_PARAM_NAMES


@flax.struct.dataclass
class SearchState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    w_opt_state: Any
    a_opt_state: Any


def _label_search_params(params):
    def label(path, _):
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "criterion":
            return "criterion"
        if keys and keys[-1] in ARCH_PARAM_NAMES:
            return "arch"
        return "weights"
    return jax.tree_util.tree_map_with_path(label, params)


def make_search_optimizers(*, w_lr: float, alpha_lr: float,
                           lr_step: Sequence[int], lr_factor: float,
                           steps_per_epoch: int,
                           alpha_weight_decay: float = 1e-3,
                           criterion_lr: float = 1e-4):
    """(weight_tx, arch_tx) replicating search_lip_sync.py:273-280."""
    w_sched = multistep_lr(w_lr, lr_step, lr_factor, steps_per_epoch)
    weight_tx = optax.multi_transform(
        {"weights": optax.adam(w_sched),
         "criterion": optax.adam(criterion_lr),
         "arch": optax.set_to_zero()},
        _label_search_params)
    arch_adam = optax.chain(
        optax.add_decayed_weights(alpha_weight_decay),
        optax.scale_by_adam(b1=0.5, b2=0.999),
        optax.scale(-alpha_lr))
    arch_tx = optax.multi_transform(
        {"weights": optax.set_to_zero(),
         "criterion": optax.set_to_zero(),
         "arch": arch_adam},
        _label_search_params)
    return weight_tx, arch_tx


def init_search_state(model, weight_tx, arch_tx, rng, sample_image,
                      num_stages: int) -> SearchState:
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, sample_image, train=False)
    params = {"model": variables["params"],
              "criterion": init_criterion_params(num_stages)}
    return SearchState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=variables["batch_stats"],
                       w_opt_state=weight_tx.init(params),
                       a_opt_state=arch_tx.init(params))


def make_search_steps(model, weight_tx, arch_tx, *, class_weights,
                      ignore_index: int = 255, ohem_thres: float = 0.9,
                      ohem_keep: int = 131072,
                      use_target_weight: bool = False,
                      share_program: bool = True,
                      zero_mesh=None):
    """Returns (weight_step, arch_step), both jitted.

    weight_step(state, batch): standard step on the train split.
    arch_step(state, batch, entropy_coef): arch step on the mini split;
    ``entropy_coef`` is 1.0 after the entropy epoch else 0.0
    (function.py:610-617).

    ``share_program=True`` compiles ONE bi-level program: the gradient
    computation (>99% of the HLO) is shared and a traced branch selects
    which optimizer applies — halving the full-scale (L=16/C=32/384px)
    compile time vs two separate programs. The loss scale (reference uses
    ``loss2 = 2*losses2`` on the arch step, function.py:612) and entropy
    coefficient become traced scalars.

    ``zero_mesh``: a Mesh enables ZeRO-1 — both Adam moment trees stay
    sharded over ``data`` (``parallel/zero.py``; place the state with
    ``shard_state_zero(state, mesh, fields=SEARCH_OPT_FIELDS)`` first).
    """
    def _constrain(state: SearchState) -> SearchState:
        if zero_mesh is None:
            return state
        from npp_tpu.parallel.zero import (SEARCH_OPT_FIELDS,
                                           constrain_state_zero)

        return constrain_state_zero(state, zero_mesh,
                                    fields=SEARCH_OPT_FIELDS)

    def _loss(params, batch_stats, batch, scale, entropy_coef):
        loss, (new_stats, metrics, _) = compute_losses(
            model, params, batch_stats, batch, train=True,
            class_weights=class_weights, ignore_index=ignore_index,
            ohem_thres=ohem_thres, ohem_keep=ohem_keep,
            use_target_weight=use_target_weight)
        arch = {k: params["model"][k] for k in ARCH_PARAM_NAMES}
        ent = loss_entropy(arch)
        total = scale * loss + 2.0 * ent * entropy_coef
        metrics = dict(metrics, entropy=ent)
        return total, (new_stats, metrics)

    if share_program:
        def bilevel(state: SearchState, batch, is_arch, entropy_coef):
            scale = jnp.where(is_arch, 2.0, 1.0)
            ecoef = jnp.where(is_arch, entropy_coef, 0.0)
            grads, (new_stats, metrics) = jax.grad(
                lambda p: _loss(p, state.batch_stats, batch, scale, ecoef),
                has_aux=True)(state.params)

            def apply_weight(_):
                u, w_new = weight_tx.update(grads, state.w_opt_state,
                                            state.params)
                return (optax.apply_updates(state.params, u), w_new,
                        state.a_opt_state)

            def apply_arch(_):
                u, a_new = arch_tx.update(grads, state.a_opt_state,
                                          state.params)
                return (optax.apply_updates(state.params, u),
                        state.w_opt_state, a_new)

            params, w_opt, a_opt = jax.lax.cond(is_arch, apply_arch,
                                                apply_weight, None)
            step = state.step + jnp.where(is_arch, 0, 1)
            return _constrain(SearchState(
                step=step, params=params, batch_stats=new_stats,
                w_opt_state=w_opt, a_opt_state=a_opt)), metrics

        bilevel = jax.jit(bilevel)

        def weight_step(state, batch):
            return bilevel(state, batch, jnp.bool_(False), jnp.float32(0.0))

        def arch_step(state, batch, entropy_coef):
            return bilevel(state, batch, jnp.bool_(True),
                           jnp.asarray(entropy_coef, jnp.float32))

        return weight_step, arch_step

    def weight_step(state: SearchState, batch):
        grads, (new_stats, metrics) = jax.grad(
            lambda p: _loss(p, state.batch_stats, batch, 1.0, 0.0),
            has_aux=True)(state.params)
        updates, new_opt = weight_tx.update(grads, state.w_opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return _constrain(SearchState(
            step=state.step + 1, params=params, batch_stats=new_stats,
            w_opt_state=new_opt, a_opt_state=state.a_opt_state)), metrics

    def arch_step(state: SearchState, batch, entropy_coef):
        grads, (new_stats, metrics) = jax.grad(
            lambda p: _loss(p, state.batch_stats, batch, 2.0, entropy_coef),
            has_aux=True)(state.params)
        updates, new_opt = arch_tx.update(grads, state.a_opt_state,
                                          state.params)
        params = optax.apply_updates(state.params, updates)
        return _constrain(SearchState(
            step=state.step, params=params, batch_stats=new_stats,
            w_opt_state=state.w_opt_state, a_opt_state=new_opt)), metrics

    return jax.jit(weight_step), jax.jit(arch_step)


def get_arch_params(state: SearchState) -> dict:
    import numpy as np

    return {k: np.asarray(state.params["model"][k])
            for k in ARCH_PARAM_NAMES}
