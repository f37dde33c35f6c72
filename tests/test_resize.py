"""Parity tests: resize/pooling vs torch reference semantics."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from npp_tpu.ops.pooling import adaptive_avg_pool, avg_pool, max_pool
from npp_tpu.ops.resize import resize_bilinear, resize_nearest, resize_scale


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(t_nchw):
    return np.transpose(t_nchw.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("shape_out", [(24, 24), (48, 48), (17, 31), (96, 96)])
def test_bilinear_matches_torch(align, shape_out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12, 12, 5)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), shape_out,
                                      align_corners=align))
    ref = _nhwc(F.interpolate(_nchw(x), size=shape_out, mode="bilinear",
                              align_corners=align))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("scale", [0.5, 2.0, 4.0, 0.25])
def test_scale_factor_matches_torch(scale):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(resize_scale(jnp.asarray(x), scale, align_corners=True))
    ref = _nhwc(F.interpolate(_nchw(x), scale_factor=scale, mode="bilinear",
                              align_corners=True))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_nearest_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 10, 10, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(x), (40, 40)))
    ref = _nhwc(F.interpolate(_nchw(x), size=(40, 40), mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_max_pool_matches_torch(stride):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
    ours = np.asarray(max_pool(jnp.asarray(x), 3, stride, 1))
    ref = _nhwc(torch.nn.MaxPool2d(3, stride, 1)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("stride", [1, 2])
def test_avg_pool_count_exclude_pad_matches_torch(stride):
    # Reference uses count_include_pad=False (operations.py:57).
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
    ours = np.asarray(avg_pool(jnp.asarray(x), 3, stride, 1,
                               count_include_pad=False))
    ref = _nhwc(torch.nn.AvgPool2d(3, stride, 1,
                                   count_include_pad=False)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_avg_pool_2x2_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(avg_pool(jnp.asarray(x), 2, 2, 0))
    ref = _nhwc(torch.nn.AvgPool2d(2)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.parametrize("kernel,stride,padding", [(3, 1, 1), (3, 2, 1),
                                                   (2, 2, 0), (5, 2, 2)])
def test_shift_max_pool_bit_identical(kernel, stride, padding):
    # SearchNet traces its forward under shift_pools() (models/search.py);
    # max must be BIT-identical to the reduce_window default.
    from npp_tpu.ops import pooling
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 4)).astype(np.float32))
    base = np.asarray(max_pool(x, kernel, stride, padding))
    with pooling.shift_pools():
        shift = np.asarray(max_pool(x, kernel, stride, padding))
    assert np.array_equal(base, shift)


@pytest.mark.parametrize("count_include_pad", [True, False])
def test_shift_avg_pool_matches_torch(count_include_pad):
    from npp_tpu.ops import pooling
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
    with pooling.shift_pools():
        ours = np.asarray(avg_pool(jnp.asarray(x), 3, 1, 1,
                                   count_include_pad=count_include_pad))
    ref = _nhwc(torch.nn.AvgPool2d(3, 1, 1,
                                   count_include_pad=count_include_pad)(
                                       _nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_shift_pools_max_mode():
    # "max" mode: shift max pools, reduce_window avg pools — outputs
    # must match the defaults either way.
    from npp_tpu.ops import pooling
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((1, 10, 10, 3)).astype(np.float32))
    base_max = np.asarray(max_pool(x, 3, 2, 1))
    base_avg = np.asarray(avg_pool(x, 3, 2, 1, count_include_pad=False))
    with pooling.shift_pools("max"):
        np.testing.assert_array_equal(np.asarray(max_pool(x, 3, 2, 1)),
                                      base_max)
        np.testing.assert_allclose(
            np.asarray(avg_pool(x, 3, 2, 1, count_include_pad=False)),
            base_avg, atol=1e-6)


def test_shift_pool_grads_match_torch():
    # avg grads are linear (must match exactly); max grads match wherever
    # the window max is unique (ties: shift splits evenly, torch assigns
    # the first element — both valid subgradients, so ties are excluded).
    import jax
    from npp_tpu.ops import pooling
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1, 8, 8, 2)).astype(np.float32)

    def loss_avg(z):
        with pooling.shift_pools():
            return avg_pool(z, 3, 2, 1, count_include_pad=False).sum()

    def loss_max(z):
        with pooling.shift_pools():
            return max_pool(z, 3, 2, 1).sum()

    g_avg = np.asarray(jax.grad(loss_avg)(jnp.asarray(x)))
    g_max = np.asarray(jax.grad(loss_max)(jnp.asarray(x)))

    t = _nchw(x).requires_grad_(True)
    torch.nn.AvgPool2d(3, 2, 1, count_include_pad=False)(t).sum().backward()
    np.testing.assert_allclose(g_avg, _nhwc(t.grad), atol=1e-6)

    t2 = _nchw(x).requires_grad_(True)
    torch.nn.MaxPool2d(3, 2, 1)(t2).sum().backward()
    np.testing.assert_allclose(g_max, _nhwc(t2.grad), atol=1e-6)


@pytest.mark.parametrize("out", [(1, 1), (2, 2), (3, 3), (1, 12), (12, 1),
                                 (5, 7)])
def test_adaptive_avg_pool_matches_torch(out):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 12, 12, 4)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool(jnp.asarray(x), out))
    ref = _nhwc(torch.nn.AdaptiveAvgPool2d(out)(_nchw(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
