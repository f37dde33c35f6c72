"""Spatial partitioning (sp): shard the image height axis across chips.

TPU-native model parallelism for the conv net. Convolutions, pools, and
resizes over a spatially sharded activation are handled by XLA's SPMD
partitioner, which inserts the halo exchanges (``collective-permute`` of
boundary rows over ICI) automatically — the model code is unchanged; only
the input shardings differ. The reference has no analog (its only
parallelism is DDP data parallelism, ``search_lip_sync.py:271``); this is
mesh-native scaling in the scaling-book sense: pick a mesh, annotate
shardings, let XLA place the collectives.

When to use which axis:

- ``data`` (dp): throughput. Batch dim sharded; grads/BN moments become
  XLA all-reduces. The default for training.
- ``space`` (sp): latency and memory. The image H dim sharded, so one
  image's FLOPs are spread over ``n_space`` chips (single-image latency
  drops) and activations larger than one chip's HBM fit (e.g. the 768px
  multi-scale eval tiles). Halo cost is one boundary-row exchange per
  conv — negligible next to the conv itself for H_shard >> kernel/2.
- Composed dp x sp grids: a 2-D mesh, batch on ``data`` AND H on
  ``space``; both collectives ride ICI.

Divisibility: H (and the stride-4 target height h = H/4) must divide by
``n_space``; batch by ``n_data``. With 384px inputs and pose targets at
96px, ``n_space`` in {2, 4, 8} works.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh_2d(n_data: int, n_space: int, devices=None) -> Mesh:
    """A (data, space) mesh. ``n_data * n_space`` must equal the device
    count used. Adjacent devices share the ``space`` axis (the minor
    mesh dim) so halo exchanges ride nearest-neighbor ICI links."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data * n_space != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_space} needs {n_data * n_space} devices, "
            f"got {len(devices)}")
    grid = np.asarray(devices).reshape(n_data, n_space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC image: batch over ``data``, H over ``space`` (if present)."""
    if SPACE_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch_spatial(batch: dict, mesh: Mesh) -> dict:
    """Place a train/eval batch dict on a dp x sp mesh.

    Rank >= 3 arrays (image NHWC, par/edge NHW, pose/pose_aux NhwJ) get
    batch-over-``data`` + H-over-``space``; rank <= 2 arrays
    (pose_weight, names indices) get batch-over-``data`` only."""
    img = image_sharding(mesh)
    dp = NamedSharding(mesh, P(DATA_AXIS))

    def place(x):
        return jax.device_put(x, img if np.ndim(x) >= 3 else dp)

    return {k: place(v) for k, v in batch.items()}


def check_divisibility(batch: int, height: int, n_data: int,
                       n_space: int, target_stride: int = 4) -> None:
    """Raise with a clear message when shapes don't tile onto the mesh."""
    if batch % n_data:
        raise ValueError(f"batch {batch} not divisible by data={n_data}")
    if height % n_space:
        raise ValueError(f"height {height} not divisible by space={n_space}")
    if (height // target_stride) % n_space:
        raise ValueError(
            f"target height {height // target_stride} (stride "
            f"{target_stride}) not divisible by space={n_space}")
