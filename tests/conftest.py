"""Test configuration: force an 8-device CPU mesh.

This is the TPU-native substitute for a fake distributed backend (the
reference has none — SURVEY.md §4): collectives and shardings are exercised
on virtual CPU devices.

The environment's sitecustomize imports jax at interpreter startup, which
locks XLA_FLAGS before conftest can set them — JAX_PLATFORM_NAME still
selects the CPU backend lazily, so single-device tests run here, and
multi-device (mesh) tests spawn a subprocess with XLA_FLAGS set (see
tests/test_parallel.py).
"""
import os

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_model_bundle():
    """One small NPPNet + params shared across model tests (init is the
    expensive part: ~2 min of tracing)."""
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=7, num_joints=14, layers=8, init_channels=8,
                   refine_layers=1, dtype=jnp.float32)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False)
    return model, variables, x
