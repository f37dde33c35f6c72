"""Pooling helpers with PyTorch-matching semantics (NHWC).

Covers the pooling variants the reference ops use:
- ``nn.MaxPool2d(3, s, 1)`` — implicit -inf padding;
- ``nn.AvgPool2d(3, s, 1, count_include_pad=False)`` — divisor excludes
  padding (reference models/operations.py:57);
- ``nn.AvgPool2d(2, 2)`` and ``nn.AdaptiveAvgPool2d`` for SE / heads.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pool_dims(kernel: int, stride: int):
    return (1, kernel, kernel, 1), (1, stride, stride, 1)


import functools


@functools.lru_cache(maxsize=None)
def _window_counts(h: int, w: int, kernel: int, stride: int,
                   padding: int) -> np.ndarray:
    """(1, H', W', 1) count of in-bounds pixels per pooling window."""
    def axis_counts(n):
        n_out = (n + 2 * padding - kernel) // stride + 1
        c = np.zeros(n_out, np.float32)
        for i in range(n_out):
            a = i * stride - padding
            b = a + kernel
            c[i] = min(b, n) - max(a, 0)
        return c
    ch = axis_counts(h)
    cw = axis_counts(w)
    return (ch[:, None] * cw[None, :])[None, :, :, None]


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    dims, strides = _pool_dims(kernel, stride)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    init = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) else np.iinfo(
        np.dtype(x.dtype)).min
    # Literal init value: reduce_window AD requires a known (non-traced)
    # init primal.
    return jax.lax.reduce_window(x, np.asarray(init, x.dtype)[()],
                                 jax.lax.max, dims, strides, pad)


def avg_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int, *,
             count_include_pad: bool = True) -> jnp.ndarray:
    dims, strides = _pool_dims(kernel, stride)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    summed = jax.lax.reduce_window(x, np.asarray(0, x.dtype)[()],
                                   jax.lax.add, dims, strides, pad)
    if count_include_pad or padding == 0:
        return summed / jnp.array(kernel * kernel, x.dtype)
    # Divisor = number of in-bounds elements per window. It only depends on
    # (H, W, kernel, stride, padding) — computed host-side in numpy so it
    # enters the graph as a constant.
    counts = _window_counts(x.shape[1], x.shape[2], kernel, stride, padding)
    return summed / jnp.asarray(counts, x.dtype)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """``nn.AdaptiveAvgPool2d`` for NHWC.

    PyTorch bins: start = floor(i*H/OH), end = ceil((i+1)*H/OH). Expressed as
    two dense averaging matrices so it stays a pair of MXU contractions.
    """
    oh, ow = out_hw
    h, w = x.shape[-3], x.shape[-2]

    def bin_matrix(n_in, n_out):
        m = np.zeros((n_out, n_in), dtype=np.float32)
        for i in range(n_out):
            a = int(np.floor(i * n_in / n_out))
            b = int(np.ceil((i + 1) * n_in / n_out))
            m[i, a:b] = 1.0 / (b - a)
        return m

    prec = jax.lax.Precision.HIGHEST
    mh = jnp.asarray(bin_matrix(h, oh), dtype=x.dtype)
    mw = jnp.asarray(bin_matrix(w, ow), dtype=x.dtype)
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=prec)
    x = jnp.einsum("pw,...hwc->...hpc", mw, x, precision=prec)
    return x


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(-3, -2), keepdims=keepdims)
