"""Tensor (channel) parallelism: shard conv channels across chips.

The third mesh axis (after ``data``/``space``): conv kernels shard their
output-channel dim, per-channel vectors (conv bias, BN scale/bias/
running stats, and their optimizer moments) shard the same way, and the
XLA SPMD partitioner propagates the matching channel sharding through
activations, inserting the cross-chip collectives (all-gathers at
channel concats / contracting-dim reduces) on ICI. Model code is
unchanged — sharding is pure data placement, the scaling-book recipe.

The reference has no analog (DDP only). When to use: weights or
activations too large for one chip's HBM at a width where sp alone
doesn't help (wide-channel variants), or to cut per-chip weight memory
in serving. For the flagship widths dp (throughput) and sp (latency)
remain the first choices — tp's collectives are per-conv, so it pays
only when channel dims are large (:math:`\\gg` 128 per shard).

Placement is shape-driven: any leaf whose channel (last) dim divides
``n_model`` shards; everything else replicates over ``model``. That
rule is consistent by construction — a conv kernel (HWIO), its bias,
the following BN's vectors, and their Adam moments all share the same
channel count.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from npp_tpu.parallel.spatial import DATA_AXIS, SPACE_AXIS

MODEL_AXIS = "model"


def make_mesh_3d(n_data: int, n_space: int, n_model: int,
                 devices=None) -> Mesh:
    """A (data, space, model) mesh; ``model`` minor-most so the
    per-conv channel collectives ride nearest-neighbor ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_space * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space}x{n_model} needs "
            f"{n_data * n_space * n_model} devices, got {len(devices)}")
    grid = np.asarray(devices).reshape(n_data, n_space, n_model)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS, MODEL_AXIS))


def tp_spec(x, n_model: int) -> P:
    """PartitionSpec for one array under channel sharding (see module
    docstring for the shape rule)."""
    shape = np.shape(x)
    if len(shape) == 4 and shape[-1] % n_model == 0:
        return P(None, None, None, MODEL_AXIS)       # conv kernel HWIO
    if len(shape) == 1 and shape[0] % n_model == 0:
        return P(MODEL_AXIS)                          # per-channel vector
    return P()


def shard_tree_tp(tree, mesh: Mesh):
    """Place a pytree (variables / TrainState) with channel sharding.

    Scalars, non-divisible leaves, and anything that isn't a conv
    kernel or per-channel vector replicate (the criterion lambdas, step
    counters, schedule state)."""
    n_model = int(mesh.shape[MODEL_AXIS])

    def place(x):
        return jax.device_put(x, NamedSharding(mesh, tp_spec(x, n_model)))

    return jax.tree.map(place, tree)
