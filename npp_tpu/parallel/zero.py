"""ZeRO-style optimizer-state sharding over the ``data`` axis.

Data-parallel training replicates the Adam moments on every chip; for a
fp32-state model that is 2 extra parameter copies per device (the
reference replicates them per-GPU the same way — DDP holds a full
optimizer per rank, ``augment_lip_sync.py:207-213``). ZeRO-1 shards the
moments across the data-parallel group instead: each chip stores
``1/n_data`` of ``mu``/``nu``, computes its shard of the Adam update,
and the updated params are all-gathered back to replicated.

TPU-native shape: no hand-written reduce-scatter/all-gather — the
moments are *placed* sharded (`shard_state_zero`) and the train step
*constrains* its outputs to the same placement
(`constrain_state_zero`); XLA's SPMD partitioner then computes the
moment/update elementwise math shard-locally and inserts the one
all-gather where the updates meet the replicated params. The step math
is the replicated step's (elementwise per moment entry); in practice
losses match tightly while individual params can drift by up to ~2*lr
per step at near-zero-gradient elements, because reduce-scatter vs
all-reduce summation order perturbs Adam's sign-like first updates
(quantified in tests/test_parallel.py).

When to use: memory headroom. The flagship (77M params) fits easily on
one v5e, so dp-replicated is the default; wide/deep variants or large
per-chip batches flip that — ZeRO-1 frees ``2 * P * (n-1)/n * 4`` bytes
per chip with one extra update-sized all-gather per step on ICI.

Leaf placement is shape-driven like ``tensor.tp_spec``: shard the
trailing-most dim divisible by ``n_data``, replicate anything without
one (scalars, Adam counts, the criterion lambdas).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def zero_spec(x, n: int, axis_name: str = DATA_AXIS) -> P:
    """PartitionSpec sharding the trailing-most dim divisible by ``n``."""
    shape = np.shape(x)
    for d in range(len(shape) - 1, -1, -1):
        if shape[d] >= n and shape[d] % n == 0:
            spec = [None] * len(shape)
            spec[d] = axis_name
            return P(*spec)
    return P()


OPT_FIELDS = ("opt_state",)           # core.train.TrainState
SEARCH_OPT_FIELDS = ("w_opt_state", "a_opt_state")  # core.search.SearchState


def _map_state(state, moment_fn, other_fn, fields=OPT_FIELDS):
    """Apply ``moment_fn`` to the optimizer-state field(s) and
    ``other_fn`` to every other state leaf (params, batch stats, step).

    ``fields`` names the flax.struct dataclass fields holding optimizer
    state: ``("opt_state",)`` for ``TrainState``,
    ``("w_opt_state", "a_opt_state")`` for ``SearchState``."""
    news = {f: jax.tree.map(moment_fn, getattr(state, f)) for f in fields}
    rest = jax.tree.map(other_fn,
                        state.replace(**{f: None for f in fields}))
    return rest.replace(**news)


def shard_state_zero(state, mesh: Mesh, axis_name: str = DATA_AXIS,
                     fields=OPT_FIELDS):
    """Place a train/search state with ZeRO-1 placement: optimizer
    moments sharded over ``data``, everything else replicated."""
    n = int(mesh.shape[axis_name])
    repl = NamedSharding(mesh, P())

    def moment(x):
        return jax.device_put(x, NamedSharding(mesh,
                                               zero_spec(x, n, axis_name)))

    return _map_state(state, moment, lambda x: jax.device_put(x, repl),
                      fields)


def constrain_state_zero(state, mesh: Mesh, axis_name: str = DATA_AXIS,
                         fields=OPT_FIELDS):
    """In-jit sharding constraints matching :func:`shard_state_zero` —
    keeps the updated state in ZeRO placement across steps (and makes
    input donation valid: in/out shardings agree)."""
    n = int(mesh.shape[axis_name])
    repl = NamedSharding(mesh, P())

    def moment(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, zero_spec(x, n, axis_name)))

    return _map_state(state, moment,
                      lambda x: jax.lax.with_sharding_constraint(x, repl),
                      fields)


def hybrid_zero_spec(x, n_data: int, n_model: int,
                     data_axis: str = DATA_AXIS,
                     model_axis: str = "model") -> P:
    """PartitionSpec sharding a moment leaf over BOTH mesh axes (the
    FSDP x TP pattern): conv-kernel moments keep their output-channel
    dim on ``model`` (matching ``tensor.tp_spec`` so they live beside
    the identically-sharded params) and additionally shard the input-
    channel dim over ``data`` (the ZeRO-1 saving). Depthwise kernels
    (I == 1) and non-divisible dims fall back per-dim; vectors follow
    ``tp_spec``; anything else replicates."""
    shape = np.shape(x)
    if len(shape) == 4:
        spec = [None, None, None, None]
        if shape[3] % n_model == 0 and shape[3] >= n_model:
            spec[3] = model_axis
        if shape[2] % n_data == 0 and shape[2] >= n_data:
            spec[2] = data_axis
        return P(*spec)
    if len(shape) == 1 and shape[0] % n_model == 0 and shape[0] >= n_model:
        return P(model_axis)
    if len(shape) == 1 and shape[0] % n_data == 0 and shape[0] >= n_data:
        return P(data_axis)
    return P()


def shard_opt_state_hybrid(state, mesh: Mesh, data_axis: str = DATA_AXIS,
                           model_axis: str = "model", fields=OPT_FIELDS):
    """Re-place a tp-sharded state's optimizer moments with the hybrid
    ZeRO x TP layout (:func:`hybrid_zero_spec`); other fields keep their
    current placement (use after ``tensor.shard_tree_tp``)."""
    n_data = int(mesh.shape[data_axis])
    n_model = int(mesh.shape[model_axis])

    def moment(x):
        return jax.device_put(x, NamedSharding(
            mesh, hybrid_zero_spec(x, n_data, n_model, data_axis,
                                   model_axis)))

    return _map_state(state, moment, lambda x: x, fields)


def make_zero_train_step(model, tx, mesh: Mesh, *, donate: bool = True,
                         steps_per_dispatch: int = 1,
                         axis_name: str = DATA_AXIS, **loss_kw):
    """The jitted train step with ZeRO-1 output placement.

    Same math as ``train.make_train_step`` (it wraps the same step
    body); the only addition is the output constraint pinning moments
    sharded / params replicated. ``steps_per_dispatch > 1`` scans K
    steps per device program (``train.make_train_step_scanned``
    semantics) with the constraint applied once per dispatch."""
    from npp_tpu.core.train import make_train_step_body

    body = make_train_step_body(model, tx, **loss_kw)

    def body_c(state, batch):
        # Constrain INSIDE the scan body so the K-step moment carry is
        # pinned sharded too — constraining only the dispatch-boundary
        # output would let the partitioner replicate the carry across
        # the scan and forfeit the memory saving mid-program.
        new_state, metrics = body(state, batch)
        return constrain_state_zero(new_state, mesh, axis_name), metrics

    def step(state, batch):
        if steps_per_dispatch > 1:
            return jax.lax.scan(body_c, state, batch)
        return body_c(state, batch)

    return jax.jit(step, donate_argnums=(0,) if donate else ())
