"""Bilinear / nearest resize with PyTorch-compatible semantics, TPU-first.

The reference leans on ``F.interpolate`` / ``nn.UpsamplingBilinear2d`` in many
places with *both* ``align_corners=True`` (models/model_augment.py:109-116,
operations.py:242) and ``align_corners=False`` (core/criterion.py:96,
core/function.py:927). ``jax.image.resize`` implements neither exactly, so we
express resize as two small dense matrix contractions (one per spatial axis).
On TPU these lower onto the MXU and fuse with neighbouring ops — faster and
bit-accurate versus gather-based interpolation.

All tensors are NHWC.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) row-stochastic linear interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        m[:, 0] = 1.0
        return m
    if align_corners:
        if n_out == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        src = np.clip(src, 0.0, n_in - 1)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.clip(i0, 0, n_in - 1)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w = (src - i0).astype(np.float32)
    rows = np.arange(n_out)
    np.add.at(m, (rows, i0), 1.0 - w)
    np.add.at(m, (rows, i1), w)
    return m


@functools.lru_cache(maxsize=None)
def _nearest_index(n_in: int, n_out: int) -> np.ndarray:
    """Index map for PyTorch 'nearest' (floor of src coordinate)."""
    idx = np.floor(np.arange(n_out, dtype=np.float64) * n_in / n_out)
    return np.clip(idx, 0, n_in - 1).astype(np.int32)


def resize_bilinear(x: jnp.ndarray, out_hw: tuple[int, int], *,
                    align_corners: bool) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC / NJHW-free 4D) tensor to (H', W')."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    dtype = x.dtype
    mh = jnp.asarray(_interp_matrix(h_in, h_out, align_corners), dtype=dtype)
    mw = jnp.asarray(_interp_matrix(w_in, w_out, align_corners), dtype=dtype)
    # (..., H, W, C): contract H then W on the MXU. For fp32 inputs (the
    # decode/eval parity paths) force HIGHEST precision so interpolation is
    # bit-faithful to the reference; for bf16 model activations the default
    # single-pass MXU precision is the right speed/accuracy trade.
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision=prec)
    x = jnp.einsum("pw,...hwc->...hpc", mw, x, precision=prec)
    return x


def scale_output_size(size: int, scale: float) -> int:
    """PyTorch computes output size as floor(in * scale_factor)."""
    return int(np.floor(size * scale))


def resize_scale(x: jnp.ndarray, scale: float, *,
                 align_corners: bool = True) -> jnp.ndarray:
    """``F.interpolate(x, scale_factor=scale, mode='bilinear')`` equivalent."""
    h = scale_output_size(x.shape[-3], scale)
    w = scale_output_size(x.shape[-2], scale)
    return resize_bilinear(x, (h, w), align_corners=align_corners)


def resize_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Nearest-neighbour resize (PyTorch 'nearest' / cv2 INTER_NEAREST grid)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    hi = jnp.asarray(_nearest_index(h_in, h_out))
    wi = jnp.asarray(_nearest_index(w_in, w_out))
    x = jnp.take(x, hi, axis=-3)
    x = jnp.take(x, wi, axis=-2)
    return x
