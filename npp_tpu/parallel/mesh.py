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
    num_proc = os.environ.get("JAX_NUM_PROCESSES")
    proc_id = os.environ.get("JAX_PROCESS_ID")
    if bool(num_proc) != bool(proc_id):
        raise RuntimeError(
            "JAX_NUM_PROCESSES and JAX_PROCESS_ID must be set together "
            f"(got JAX_NUM_PROCESSES={num_proc!r}, "
            f"JAX_PROCESS_ID={proc_id!r}); set both explicitly, or "
            "neither on a managed cluster that auto-detects them.")
    kwargs = {"coordinator_address": addr}
    if num_proc:
        kwargs["num_processes"] = int(num_proc)
        kwargs["process_id"] = int(proc_id)
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
