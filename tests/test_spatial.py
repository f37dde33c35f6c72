"""Spatial-partitioning (sp) tests: H sharded over a ``space`` mesh axis.

Same subprocess pattern as test_parallel.py (XLA_FLAGS is locked by the
environment's sitecustomize, so the virtual device count is forced in a
child process).
"""
import os
import subprocess
import sys

import pytest

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow

from npp_tpu.parallel.spatial import check_divisibility


def _run_in_mesh_env(code: str, n_devices: int = 8, timeout: int = 560):
    env = dict(os.environ)
    env["JAX_PLATFORM_NAME"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count={n_devices}")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    return subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=timeout)


def test_check_divisibility():
    check_divisibility(8, 64, 4, 2)
    with pytest.raises(ValueError, match="batch"):
        check_divisibility(7, 64, 4, 2)
    with pytest.raises(ValueError, match="height"):
        check_divisibility(8, 60, 4, 8)
    with pytest.raises(ValueError, match="target height"):
        check_divisibility(8, 64, 1, 32)


def test_spatial_forward_matches_replicated():
    """H-sharded forward == unsharded forward: XLA's halo exchange must
    not change the math anywhere in the net (convs, pools, resizes,
    BN eval stats)."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from npp_tpu.models.augment import NPPNet
from npp_tpu.parallel.spatial import make_mesh_2d, image_sharding


mesh = make_mesh_2d(2, 4)
model = NPPNet(num_classes=5, num_joints=4, layers=8, init_channels=8,
               refine_layers=1, dtype=jnp.float32)
img = jnp.asarray(np.random.default_rng(0).standard_normal((2, 64, 64, 3)),
                  jnp.float32)
variables = model.init(jax.random.PRNGKey(0), img, train=False)
variables_r = jax.device_put(variables, NamedSharding(mesh, P()))
img_sp = jax.device_put(img, image_sharding(mesh))

@jax.jit
def fwd(variables, image):
    pose_list, par_list = model.apply(variables, image, train=False)
    return pose_list[-1][0], par_list[-1][0]

with mesh:
    out_sp = fwd(variables_r, img_sp)
out_ref = fwd(variables, img)
for a, b in zip(jax.tree.leaves(out_sp), jax.tree.leaves(out_ref)):
    err = float(jnp.max(jnp.abs(a - b)))
    assert err < 1e-4, err
print("SP_FWD_MATCH")
"""
    r = _run_in_mesh_env(code)
    assert "SP_FWD_MATCH" in r.stdout, (r.stdout, r.stderr[-2000:])


def test_dp_sp_train_step_matches_single_device():
    """Full train step on a 4x2 (data x space) mesh == unsharded: grads,
    global BN moments, and OHEM's global top-k all reduce across BOTH
    mesh axes."""
    code = """
import numpy as np, jax, jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from npp_tpu.core import train as T
from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
from npp_tpu.models.augment import NPPNet
from npp_tpu.parallel.spatial import (make_mesh_2d, shard_batch_spatial,
                                      check_divisibility)

model = NPPNet(num_classes=5, num_joints=4, layers=8, init_channels=8,
               refine_layers=1, dtype=jnp.float32)
tx = T.make_train_optimizer(1e-3, (100,), 0.1, 10)
x = jnp.zeros((8, 64, 64, 3), jnp.float32)
state = T.init_train_state(model, tx, jax.random.PRNGKey(0), x, 2)
rng = np.random.default_rng(0)
batch = {
    "image": jnp.asarray(rng.standard_normal((8, 64, 64, 3)), jnp.float32),
    "par": jnp.asarray(rng.integers(0, 5, (8, 64, 64)), jnp.int32),
    "edge": jnp.asarray(rng.integers(0, 2, (8, 64, 64)), jnp.int32),
    "pose": jnp.asarray(rng.random((8, 16, 16, 4)), jnp.float32),
    "pose_aux": jnp.asarray(rng.random((8, 16, 16, 4)), jnp.float32),
    "pose_weight": jnp.ones((8, 4), jnp.float32),
}
step = T.make_train_step(model, tx, class_weights=LIP_CLASS_WEIGHTS[:5],
                         ohem_keep=256, donate=False)
_, m_single = step(state, batch)

check_divisibility(8, 64, 4, 2)
mesh = make_mesh_2d(4, 2)
state_s = jax.device_put(state, NamedSharding(mesh, P()))
batch_s = shard_batch_spatial(batch, mesh)
_, m_shard = step(state_s, batch_s)
a, b = float(m_single["loss"]), float(m_shard["loss"])
assert abs(a - b) / abs(a) < 1e-4, (a, b)
print("DPSP_MATCH", a, b)
"""
    r = _run_in_mesh_env(code)
    assert "DPSP_MATCH" in r.stdout, (r.stdout, r.stderr[-2000:])
