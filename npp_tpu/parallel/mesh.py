"""Device mesh, shardings, and multi-host init.

TPU-native replacement for the reference's NCCL/DDP stack
(``search_lip_sync.py:133-140`` process-group init, ``:271`` DDP,
``core/function.py:42-53`` reduce_tensor):

- one ``jax.sharding.Mesh`` with a ``data`` axis spans all chips
  (ICI within a slice, DCN across slices via ``jax.distributed``);
- the batch is sharded over ``data``; params/opt-state are replicated;
- gradient averaging and cross-replica BN stats are inserted by the XLA
  partitioner — no explicit collectives needed in model code;
- ``reduce_tensor``-style metric reductions become ordinary jnp reductions
  of sharded arrays.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> None:
    """Multi-host init over DCN (replaces torch.distributed NCCL env://
    rendezvous, search_lip_sync.py:137-139). No-op when single-process.

    Env protocol mirrors the reference launcher's env:// rendezvous:
    JAX_COORDINATOR_ADDRESS (host:port) is required; JAX_NUM_PROCESSES and
    JAX_PROCESS_ID are passed through when set (managed clusters like GKE
    TPU slices auto-detect them)."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch dict onto the mesh, sharded on the batch axis."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-process share of the global batch for multi-host input feeding."""
    n = mesh.devices.size
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // jax.process_count()
