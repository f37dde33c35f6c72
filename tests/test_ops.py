"""Shape and behavior tests for the 15 NAS primitives (SURVEY.md §2.1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from npp_tpu.genotypes import PRIMITIVES_INTER, PRIMITIVES_PC
from npp_tpu.ops.primitives import OPS, make_op

C = 8
H = W = 16


def _run(name, stride, affine=True):
    op = make_op(name, C, stride, affine, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, H, W, C)),
                    jnp.float32)
    variables = op.init(jax.random.PRNGKey(0), x, train=False)
    y = op.apply(variables, x, train=False)
    return x, y


@pytest.mark.parametrize("name", sorted(OPS))
def test_stride1_preserves_shape(name):
    x, y = _run(name, 1)
    assert y.shape == x.shape, name


@pytest.mark.parametrize("name", sorted(OPS))
def test_stride2_halves_resolution(name):
    x, y = _run(name, 2)
    assert y.shape == (2, H // 2, W // 2, C), name


def test_zero_is_zero():
    _, y = _run("none", 1)
    assert np.all(np.asarray(y) == 0)


def test_skip_is_identity():
    x, y = _run("skip_connect", 1)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_primitive_lists_cover_ops():
    for name in PRIMITIVES_PC + PRIMITIVES_INTER:
        assert name in OPS


def test_se_block_param_shapes():
    op = make_op("se_connect", C, 1, True, jnp.float32)
    x = jnp.zeros((1, H, W, C))
    variables = op.init(jax.random.PRNGKey(0), x, train=False)
    kernels = [p for p in jax.tree.leaves(variables["params"])]
    # Two 1x1 convs: C->C/2 and C/2->C, each with bias.
    sizes = sorted(int(np.prod(k.shape)) for k in kernels)
    assert sizes == sorted([C * C // 2, C // 2, C * C // 2, C])
