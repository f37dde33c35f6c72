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


import contextlib
import functools

# Trace-time pooling implementation switch. ``reduce_window`` (the
# default, mode False) fuses best in the FIXED net (measured: all-shift
# pools cost the bs16 train step +31 ms there, mostly extra backward
# loop fusions); ``shift`` (mode True) wins in the SUPERNET where every
# MixedOp runs an unfused small-channel pool + its select_and_scatter
# backward (measured: bi-level step 1.82 -> 1.64 s). SearchNet opts
# into shift pools for its whole forward via :func:`shift_pools`.
# Mode "max" applies shift to max pools only (scatter-free backward)
# while keeping reduce_window avg pools.
_SHIFT_IMPL: bool | str = False


@contextlib.contextmanager
def shift_pools(enabled: bool | str = True):
    """Use the shifted-slice pooling implementation while tracing.

    ``enabled`` may be True (both pool kinds), "max" (max pools only),
    or False."""
    global _SHIFT_IMPL
    prev = _SHIFT_IMPL
    _SHIFT_IMPL = enabled
    try:
        yield
    finally:
        _SHIFT_IMPL = prev


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


def _pool_axis(x: jnp.ndarray, axis: int, kernel: int, stride: int,
               padding: int, pad_value, combine) -> jnp.ndarray:
    """1-D pooling along ``axis`` as a fold of ``kernel`` shifted strided
    slices of the padded array (the ``shift`` implementation, see
    :data:`_SHIFT_IMPL`).

    In the supernet, small-window ``lax.reduce_window`` lowers to a slow
    loop (~6 GB/s effective per op, measured 138 ms/supernet-step across
    the MixedOps) and its max-VJP is ``select_and_scatter`` (~0.1 TF/s).
    Shifted slices + elementwise max/add fuse into plain loop fusions
    near HBM bandwidth, and the backward is selects (max) / pads (sum) —
    scatter-free. Max is bit-identical to reduce_window; sum differs
    only in fp addition order. Tie-broken max GRADIENTS differ (even
    split across tied window elements vs select_and_scatter's
    first-element assignment) — both are valid subgradients; exact ties
    do not arise in the oracle parity tests.
    """
    n = x.shape[axis]
    n_out = (n + 2 * padding - kernel) // stride + 1
    if padding:
        pads = [(0, 0)] * x.ndim
        pads[axis] = (padding, padding)
        x = jnp.pad(x, pads, constant_values=pad_value)
    out = None
    idx = [slice(None)] * x.ndim
    for d in range(kernel):
        idx[axis] = slice(d, d + (n_out - 1) * stride + 1, stride)
        piece = x[tuple(idx)]
        out = piece if out is None else combine(out, piece)
    return out


def max_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int) -> jnp.ndarray:
    init = -np.inf if jnp.issubdtype(x.dtype, jnp.floating) else np.iinfo(
        np.dtype(x.dtype)).min
    pad_value = np.asarray(init, x.dtype)[()]
    if _SHIFT_IMPL:
        x = _pool_axis(x, 1, kernel, stride, padding, pad_value, jnp.maximum)
        return _pool_axis(x, 2, kernel, stride, padding, pad_value,
                          jnp.maximum)
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    # Literal init value: reduce_window AD requires a known (non-traced)
    # init primal.
    return jax.lax.reduce_window(x, pad_value, jax.lax.max,
                                 (1, kernel, kernel, 1),
                                 (1, stride, stride, 1), pad)


def avg_pool(x: jnp.ndarray, kernel: int, stride: int, padding: int, *,
             count_include_pad: bool = True) -> jnp.ndarray:
    zero = np.asarray(0, x.dtype)[()]
    if _SHIFT_IMPL is True:  # "max" mode keeps reduce_window avg pools
        summed = _pool_axis(x, 1, kernel, stride, padding, zero, jnp.add)
        summed = _pool_axis(summed, 2, kernel, stride, padding, zero,
                            jnp.add)
    else:
        pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
        summed = jax.lax.reduce_window(x, zero, jax.lax.add,
                                       (1, kernel, kernel, 1),
                                       (1, stride, stride, 1), pad)
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
