"""Spatial (sp) and tensor (tp) parallelism across a REAL process boundary.

tests/test_multiprocess.py proves dp across two rendezvoused processes;
this file does the same for the repo's beyond-reference axes (SCALING.md):

- sp: the image H axis sharded across the boundary — XLA's SPMD
  partitioner inserts the conv halo exchanges (collective-permute of
  boundary rows) over the cross-process transport;
- tp: conv output channels + per-channel vectors sharded across the
  boundary — channel collectives span processes.

Each must reproduce the single-process step bit-closely (same TinyNet +
batch as the dp test). The reference has no analog (DDP only,
search_lip_sync.py:271).
"""
import os
import socket
import subprocess
import sys

import pytest

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow

WORKER = r"""
import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from npp_tpu.parallel.mesh import initialize_distributed, replicate

initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
rank = jax.process_index()

import flax.linen as nn
from npp_tpu.core import train as T
from npp_tpu.core.criterion import PASCAL_CLASS_WEIGHTS
from npp_tpu.ops.primitives import BatchNorm, Conv
from npp_tpu.parallel.spatial import (SPACE_AXIS, make_mesh_2d,
                                      shard_batch_spatial)
from npp_tpu.parallel.tensor import make_mesh_3d, shard_tree_tp


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x, train=False):
        x = Conv(8, (3, 3), padding=(1, 1), use_bias=False)(x)
        x = BatchNorm(True)(x, train)
        x = nn.relu(x)
        pose = Conv(4, (1, 1))(x)
        aux = Conv(4, (1, 1))(x)
        par = Conv(5, (1, 1))(x)
        edge = Conv(2, (1, 1))(x)
        return [(pose, aux)], [(par, edge)]


model = TinyNet()
tx = T.make_train_optimizer(1e-3, (100,), 0.1, 10, backbone_lr_scale=False)
state = T.init_train_state(model, tx, jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), 1)
step = T.make_train_step(model, tx, class_weights=PASCAL_CLASS_WEIGHTS[:5],
                         ohem_keep=100, donate=False)

rng = np.random.default_rng(7)
full = {
    "image": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
    "par": rng.integers(0, 5, (4, 32, 32)).astype(np.int32),
    "edge": rng.integers(0, 2, (4, 32, 32)).astype(np.int32),
    "pose": rng.random((4, 32, 32, 4)).astype(np.float32),
    "pose_aux": rng.random((4, 32, 32, 4)).astype(np.float32),
    "pose_weight": np.ones((4, 4), np.float32),
}

# Single-process reference run (replicated inputs are identical in both
# processes, so this is deterministic and common to both).
ref_state, ref_metrics = step(state, {k: jnp.asarray(v)
                                      for k, v in full.items()})
ref_loss = float(ref_metrics["loss"])


def tree_rel_err(a, b):
    # Global jitted relative error: works for arbitrarily sharded trees
    # (leaves may not be process-addressable, so no np.asarray here).
    def f(x, y):
        num = sum(jnp.sum((p - q.astype(p.dtype)) ** 2)
                  for p, q in zip(jax.tree.leaves(x), jax.tree.leaves(y)))
        den = sum(jnp.sum(q.astype(jnp.float32) ** 2)
                  for q in jax.tree.leaves(y))
        return jnp.sqrt(num / (den + 1e-12))
    return float(jax.jit(f)(a, b))


# --- sp: H sharded across the process boundary -------------------------
mesh_sp = make_mesh_2d(1, 2)
img_sh = NamedSharding(mesh_sp, P(None, SPACE_AXIS))
dp_sh = NamedSharding(mesh_sp, P(None))


def sp_global(k, v):
    if v.ndim >= 3:  # image NHWC, par/edge NHW, pose NhwJ: H is axis 1
        h = v.shape[1] // 2
        local = v[:, rank * h:(rank + 1) * h]
        return jax.make_array_from_process_local_data(img_sh, local,
                                                      v.shape)
    return jax.make_array_from_process_local_data(dp_sh, v, v.shape)


sp_batch = {k: sp_global(k, v) for k, v in full.items()}
# The image really is split across the boundary: one local shard, half H.
assert len(sp_batch["image"].addressable_shards) == 1
assert sp_batch["image"].addressable_shards[0].data.shape[1] == 16

sp_state, sp_metrics = step(replicate(state, mesh_sp), sp_batch)
assert abs(float(sp_metrics["loss"]) - ref_loss) < 1e-5 * abs(ref_loss)
assert tree_rel_err(sp_state.params, ref_state.params) < 1e-5
assert tree_rel_err(sp_state.batch_stats, ref_state.batch_stats) < 1e-5
print(f"MP_SP_OK rank={rank}")

# --- tp: conv channels sharded across the process boundary -------------
mesh_tp = make_mesh_3d(1, 1, 2)
tp_state = shard_tree_tp(state, mesh_tp)
tp_batch = shard_batch_spatial(full, mesh_tp)
# A conv kernel really is channel-split across the boundary.
k0 = jax.tree.leaves(tp_state.params["model"])[0]
assert len(k0.addressable_shards) == 1

tp_state2, tp_metrics = step(tp_state, tp_batch)
assert abs(float(tp_metrics["loss"]) - ref_loss) < 1e-5 * abs(ref_loss)
assert tree_rel_err(tp_state2.params, ref_state.params) < 1e-5
assert tree_rel_err(tp_state2.batch_stats, ref_state.batch_stats) < 1e-5
print(f"MP_TP_OK rank={rank}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_spatial_and_tensor_parallel():
    port = _free_port()
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = [p.communicate(timeout=560) for p in procs]
    for rank, (out, err) in enumerate(outs):
        assert procs[rank].returncode == 0, (rank, out, err[-3000:])
        assert f"MP_SP_OK rank={rank}" in out, (rank, out, err[-2000:])
        assert f"MP_TP_OK rank={rank}" in out, (rank, out, err[-2000:])
