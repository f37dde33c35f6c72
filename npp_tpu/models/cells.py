"""Genotype-compiled cells (encoder / decoder / refinement / injections).

TPU-native re-expression of the cell machinery in reference
``models/model_augment.py`` (Cell:16, Upsample:64, PoseCell1:119,
ParCell1:176, _compile/_compile3:576-649). Genotypes are compiled into a
static module graph at construction so the whole forward is one traced,
jit-compiled XLA program — no Python-side dynamism at step time.

All tensors NHWC; channel concat is on the last axis.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from npp_tpu.genotypes import Edge
from npp_tpu.ops.primitives import FactorizedReduce, ReLUConvBN, Conv, make_op
from npp_tpu.ops.resize import resize_nearest, resize_scale


class Cell(nn.Module):
    """DARTS encoder cell with fixed genotype (model_augment.py:16-62)."""

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    channels: int
    reduction: bool
    reduction_prev: bool
    dtype: Any = None

    def setup(self):
        c, d = self.channels, self.dtype
        if self.reduction_prev:
            self.preprocess0 = FactorizedReduce(c, True, d)
        else:
            self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        ops = []
        for name, index in self.edges:
            stride = 2 if self.reduction and index < 2 else 1
            ops.append(make_op(name, c, stride, True, d))
        self.ops = ops

    def __call__(self, s0, s1, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        for i in range(len(self.edges) // 2):
            h1 = self.ops[2 * i](states[self.edges[2 * i][1]], train)
            h2 = self.ops[2 * i + 1](states[self.edges[2 * i + 1][1]], train)
            states.append(h1 + h2)
        return jnp.concatenate([states[i] for i in self.concat], axis=-1)


class UpsampleCell(nn.Module):
    """Decoder upsample cell (model_augment.py:64-106).

    ``s0`` is the coarser (half-resolution) feature; ops reading state 0 are
    followed by a 2x bilinear upsample (align_corners=True).
    """

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    c_prev: int  # channels of s1; node width is c_prev // 4
    dtype: Any = None

    def setup(self):
        c, d = self.c_prev // 4, self.dtype
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.ops = [make_op(name, c, 1, True, d) for name, _ in self.edges]

    def _apply(self, i, x, train):
        y = self.ops[i](x, train)
        if self.edges[i][1] == 0:
            y = resize_scale(y, 2.0, align_corners=True)
        return y

    def __call__(self, s0, s1, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        for i in range(len(self.edges) // 2):
            h1 = self._apply(2 * i, states[self.edges[2 * i][1]], train)
            h2 = self._apply(2 * i + 1, states[self.edges[2 * i + 1][1]], train)
            states.append(h1 + h2)
        return jnp.concatenate([states[i] for i in self.concat], axis=-1)


class FusionCell(nn.Module):
    """Refinement cell shared by pose/par branches (model_augment.py:119-229).

    Takes three preprocessed states, runs the fused genotype steps, and
    returns ``(fea1, fea2)`` = (concat of input states, concat of the
    ``concat`` nodes). ``order=0`` is the (unused in the released net)
    multi-scale variant that upsamples states 0/1.
    """

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    channels: int
    order: int = 1
    dtype: Any = None

    def setup(self):
        c, d = self.channels, self.dtype
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess2 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.ops = [make_op(name, c, 1, True, d) for name, _ in self.edges]

    def _apply(self, i, x, train):
        y = self.ops[i](x, train)
        if self.order == 0:
            idx = self.edges[i][1]
            if idx == 0:
                y = resize_scale(y, 4.0, align_corners=True)
            elif idx == 1:
                y = resize_scale(y, 2.0, align_corners=True)
        return y

    def __call__(self, s0, s1, s2, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        s2 = self.preprocess2(s2, train)
        states = [s0, s1, s2]
        for i in range(len(self.edges) // 2):
            h1 = self._apply(2 * i, states[self.edges[2 * i][1]], train)
            h2 = self._apply(2 * i + 1, states[self.edges[2 * i + 1][1]], train)
            states.append(h1 + h2)
        if self.order == 0:
            # Reference uses default-mode (nearest) interpolate here
            # (model_augment.py:168-169).
            h, w = states[2].shape[-3], states[2].shape[-2]
            states[0] = resize_nearest(states[0], (h, w))
            states[1] = resize_nearest(states[1], (h, w))
        fea1 = jnp.concatenate(states[0:3], axis=-1)
        fea2 = jnp.concatenate([states[i] for i in self.concat], axis=-1)
        return fea1, fea2


class InterOp(nn.Module):
    """One compiled cross-task injection edge (model_augment.py:576-649).

    Runs the primitive at the source scale/width; if the edge crosses
    scales/widths, adapts with bilinear resize (align_corners=True) + 1x1
    conv to the destination width.
    """

    op_name: str
    src_channels: int
    dst_channels: int
    scale: float
    adapt: bool
    dtype: Any = None

    def setup(self):
        self.op = make_op(self.op_name, self.src_channels, 1, True, self.dtype)
        if self.adapt:
            self.proj = Conv(self.dst_channels, (1, 1), use_bias=True,
                             dtype=self.dtype)

    def __call__(self, x, train: bool):
        y = self.op(x, train)
        if self.adapt:
            if self.scale != 1:
                y = resize_scale(y, self.scale, align_corners=True)
            y = self.proj(y)
        return y


def compile_encoder_injections(groups, c_list, dtype=None):
    """Reference ``_compile`` (model_augment.py:576-599): encoder-stage
    injections. ``c_list`` is channels per feature scale (index 0 = 1/4 res).
    Returns a flat op list plus per-group source indices."""
    ops, indices = [], []
    for cont, group in enumerate(groups):
        idxs = []
        for name, ind in group:
            scale = 1.0 / (2 ** (cont - ind))
            ops.append(InterOp(name, c_list[ind], c_list[cont], scale,
                               adapt=(ind != cont), dtype=dtype))
            idxs.append(ind)
        indices.append(tuple(idxs))
    return ops, tuple(indices)


def compile_decoder_injections(groups, resolutions, c_list, dtype=None):
    """Reference ``_compile3`` (model_augment.py:626-649): decoder-stage
    injections over the 7-slot feature pyramid."""
    ops, indices = [], []
    for cont, group in enumerate(groups):
        idxs = []
        for name, ind in group:
            scale = resolutions[4 + cont] / resolutions[ind]
            ops.append(InterOp(name, c_list[ind], c_list[4 + cont], scale,
                               adapt=(ind != 4 + cont), dtype=dtype))
            idxs.append(ind)
        indices.append(tuple(idxs))
    return ops, tuple(indices)
