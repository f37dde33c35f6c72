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


# Sibling-mergeable primitive families. DEFAULT is the measured-best
# serving set (std convs + SE; BENCH.md round-4/5 serving matrix); ALL
# adds the dil/sep depthwise chains — exact but measured slightly slower
# at flagship widths (the K-fold input tile is extra HBM traffic on ops
# that are bandwidth-bound already), kept reachable for other shapes.
DEFAULT_SIBLING_FAMILIES = ("std_conv_3x3", "std_conv_1x1", "se_connect")
ALL_SIBLING_FAMILIES = DEFAULT_SIBLING_FAMILIES + (
    "dil_conv_3x3_2", "dil_conv_3x3_4", "dil_conv_5x5_4",
    "sep_conv_3x3", "sep_conv_5x5")


def sibling_groups(edges, reduction: bool = False,
                   families=DEFAULT_SIBLING_FAMILIES):
    """Edge-index groups of >=2 same-``families`` edges reading the SAME
    state with the same stride — mergeable into ONE wider op (same-name
    edges only; groups never mix op types).

    The released genotypes are rich in these (e.g. the encoder normal
    cell has three ``std_conv_3x3`` edges all reading state 0 AND an
    ``se_connect`` pair on state 1; the par fusion cell has a
    ``dil_conv_3x3_2`` pair on state 2): each conv group collapses K
    (C -> C) MXU matmuls into one (C -> K*C), each SE group shares
    one global-pool squeeze + runs the K excitation MLPs as one merged/
    grouped pair of 1x1 convs, and each dil/sep group tiles the input
    once and runs K depthwise+pointwise chains as one blocked grouped
    chain — the "fewer, larger ops" direction the round-3 device trace
    prescribed (BENCH.md: flat profile, ~1800 small fusions). Returns
    ``[((name, state, stride), (edge_idx, ...)), ...]`` sorted by first
    edge index; the module and the variable converter both call this, so
    layouts always agree."""
    byk: dict = {}
    for i, (name, idx) in enumerate(edges):
        if name in families:
            stride = 2 if reduction and idx < 2 else 1
            byk.setdefault((name, idx, stride), []).append(i)
    groups = [(k, tuple(v)) for k, v in byk.items() if len(v) >= 2]
    groups.sort(key=lambda kv: kv[1][0])
    return groups


class SiblingConvGroup(nn.Module):
    """K same-spec ReLU-Conv-BN edges on one input as a single K-wide op.

    Exact by construction: conv output channels are independent and BN
    statistics/affine are per-channel, so one (C -> K*C) conv + one
    concatenated BN equals the K separate (C -> C) ReLUConvBN edges in
    BOTH train and eval modes. The compact child structure (Conv_0,
    BatchNorm_0) deliberately mirrors ReLUConvBN so the variable
    transform is a pure per-leaf channel concat
    (models/augment.py:fuse_sibling_variables). Returns the concatenated
    (B, H, W, K*C) tensor; the caller slices per edge.

    Caveat: under int8 serving the group shares ONE dynamic requant
    scale across its K edges, so int8 outputs differ slightly from the
    unfused int8 graph (fp outputs are identical)."""

    channels: int
    k: int
    kernel: int
    stride: int
    padding: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(x)
        x = Conv(self.channels * self.k, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 use_bias=False, dtype=self.dtype)(x)
        from npp_tpu.ops.primitives import BatchNorm
        return BatchNorm(True, self.dtype)(x, train)


class SiblingSEGroup(nn.Module):
    """K same-input SEBlock edges as one merged squeeze-excitation.

    Exact by construction (both modes): the squeeze
    ``global_avg_pool(x)`` is identical across the K edges so it runs
    ONCE; the K first 1x1 convs (C -> C/2) concatenate along output
    channels into one (C -> K*C/2) conv; the K second 1x1 convs
    (C/2 -> C) become ONE grouped conv (feature_group_count=K, kernels
    concatenated along output channels) — block-diagonal, so edge k's
    excitation reads exactly its own squeeze half. The stride-2 variant
    (reduce cells) appends the avg-pool + BN tail, both per-channel.
    Child structure (Conv_0, Conv_1, BatchNorm_0) mirrors SEBlock so the
    variable transform is the same per-leaf channel concat as
    SiblingConvGroup (models/augment.py:fuse_sibling_variables). Returns
    the concatenated (B, H', W', K*C) tensor; the caller slices.

    Caveat: under int8 serving the merged 1x1 convs share one dynamic
    requant scale across the K edges (fp outputs are identical)."""

    channels: int  # unused (shapes follow x); kept parallel to ConvGroup
    k: int
    stride: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        from npp_tpu.ops import pooling
        from npp_tpu.ops.primitives import BatchNorm
        c_in = x.shape[-1]
        w = pooling.global_avg_pool(x)
        w = nn.relu(Conv(self.k * (c_in // 2), (1, 1),
                         dtype=self.dtype)(w))
        w = nn.sigmoid(Conv(self.k * c_in, (1, 1), groups=self.k,
                            dtype=self.dtype)(w))
        out = jnp.concatenate(
            [x * w[..., i * c_in:(i + 1) * c_in] for i in range(self.k)],
            axis=-1)
        if self.stride == 1:
            return out
        out = pooling.avg_pool(out, 2, 2, 0)
        return BatchNorm(True, self.dtype)(out, train)


class SiblingDilGroup(nn.Module):
    """K same-input DilConvS edges as one blocked depthwise+pointwise chain.

    Exact by construction (both modes): the input is ReLU'd once and
    tiled K-fold along channels (blocked: ``[x, x, ...]``), so one
    depthwise conv with ``K*C`` groups runs the K dilated depthwise
    kernels, one grouped pointwise (``feature_group_count=K``) runs the
    K (C -> C) 1x1 convs block-diagonally, and one concatenated BN
    replaces the K per-edge BNs. Depthwise/pointwise/BN leaves all
    concatenate along the output-channel axis, so the variable transform
    is the same per-leaf channel concat as SiblingConvGroup
    (models/augment.py:fuse_sibling_variables); child structure
    (Conv_0, Conv_1, BatchNorm_0) mirrors DilConvS. Returns the
    concatenated (B, H', W', K*C) tensor; the caller slices per edge.

    ``tiled_input=False`` skips the ReLU+tile and consumes an
    already-blocked (B, H, W, K*C) input with a plain ReLU — the second
    stage of SiblingSepGroup.

    Caveat: under int8 serving the unfused DilConvS pointwise (a dense
    C -> C conv) quantizes, but the merged pointwise is a grouped conv
    and grouped convs always stay floating point (ops/primitives.Conv)
    — fp outputs are identical, int8 outputs differ slightly from the
    unfused int8 graph (same class of caveat as SiblingConvGroup's
    shared requant scale)."""

    channels: int
    k: int
    kernel: int
    stride: int
    padding: int
    dilation: int
    dtype: Any = None
    tiled_input: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        from npp_tpu.ops.primitives import BatchNorm
        x = nn.relu(x)
        if self.tiled_input:
            x = jnp.tile(x, (1, 1, 1, self.k))
        c_in = x.shape[-1]  # == K * per-edge input channels
        x = Conv(c_in, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 dilation=(self.dilation, self.dilation), groups=c_in,
                 use_bias=False, dtype=self.dtype)(x)
        x = Conv(self.channels * self.k, (1, 1), groups=self.k,
                 use_bias=False, dtype=self.dtype)(x)
        return BatchNorm(True, self.dtype)(x, train)


class SiblingSepGroup(nn.Module):
    """K same-input SepConv edges as two stacked blocked dil-group stages.

    SepConv is two stacked dilation-1 DilConvS (ops/primitives.py:261);
    the group version tiles once in stage 0 and feeds the blocked
    (B, H', W', K*C) result straight into stage 1 (``tiled_input=False``).
    Child names (DilConvS_0, DilConvS_1) mirror SepConv so the variable
    transform stays the uniform per-leaf channel concat. Exact in fp;
    same int8 grouped-conv caveat as SiblingDilGroup."""

    channels: int
    k: int
    kernel: int
    stride: int
    padding: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        x = SiblingDilGroup(c_in, self.k, self.kernel, self.stride,
                            self.padding, 1, self.dtype,
                            name="DilConvS_0")(x, train)
        x = SiblingDilGroup(self.channels, self.k, self.kernel, 1,
                            self.padding, 1, self.dtype, tiled_input=False,
                            name="DilConvS_1")(x, train)
        return x


# (kernel, padding, dilation) per dil primitive — mirrors the OPS table
# (ops/primitives.py:378-380); sep entries are (kernel, padding).
_DIL_SPECS = {"dil_conv_3x3_2": (3, 2, 2), "dil_conv_3x3_4": (3, 4, 4),
              "dil_conv_5x5_4": (5, 4, 2)}
_SEP_SPECS = {"sep_conv_3x3": (3, 1), "sep_conv_5x5": (5, 2)}


class _SiblingMixin:
    """Shared edge-op plumbing for cells that support ``fuse_siblings``.

    ``_setup_edge_ops(channels, dtype)`` builds either the plain per-edge
    op list or (fused) SiblingConvGroups + the residual op list;
    ``_edge_out(e, states, train, post=None)`` evaluates edge ``e``
    against the state list, lazily computing each group ONCE per call at
    its first use (all edges of a group read the same state, so the
    input is final by then). ``post`` post-processes a whole group's
    concatenated output (UpsampleCell's 2x upsample) before slicing —
    exact because resize is per-channel."""

    def _edge_stride(self, index: int) -> int:
        return 2 if getattr(self, "reduction", False) and index < 2 else 1

    def _setup_edge_ops(self, c, d):
        if not self.fuse_siblings:
            self.ops = [make_op(name, c, self._edge_stride(index), True, d)
                        for name, index in self.edges]
            return
        groups = sibling_groups(self.edges,
                                getattr(self, "reduction", False),
                                getattr(self, "sibling_families",
                                        DEFAULT_SIBLING_FAMILIES))
        self._groups = groups
        slot, sib = {}, []
        for g, ((name, _idx, stride), es) in enumerate(groups):
            if name == "se_connect":
                sib.append(SiblingSEGroup(c, len(es), stride, d))
            elif name in _DIL_SPECS:
                ksz, pad, dil = _DIL_SPECS[name]
                sib.append(SiblingDilGroup(c, len(es), ksz, stride, pad,
                                           dil, d))
            elif name in _SEP_SPECS:
                ksz, pad = _SEP_SPECS[name]
                sib.append(SiblingSepGroup(c, len(es), ksz, stride, pad, d))
            else:
                ksz, pad = (3, 1) if name == "std_conv_3x3" else (1, 0)
                sib.append(SiblingConvGroup(c, len(es), ksz, stride, pad,
                                            d))
            for s_i, e in enumerate(es):
                slot[e] = (g, s_i)
        self.sib = sib
        self._slot = slot
        ops, pos = [], {}
        for e, (name, index) in enumerate(self.edges):
            if e in slot:
                continue
            pos[e] = len(ops)
            ops.append(make_op(name, c, self._edge_stride(index), True, d))
        self.ops = ops
        self._op_pos = pos

    def _edge_out(self, e, states, train, cache, post=None):
        x = states[self.edges[e][1]]
        if self.fuse_siblings and e in self._slot:
            g, s_i = self._slot[e]
            if g not in cache:
                y = self.sib[g](x, train)
                cache[g] = post(y) if post is not None else y
            c = cache[g].shape[-1] // len(self._groups[g][1])
            return cache[g][..., s_i * c:(s_i + 1) * c]
        op = self.ops[self._op_pos[e]] if self.fuse_siblings else self.ops[e]
        y = op(x, train)
        return post(y) if post is not None else y


class Cell(nn.Module, _SiblingMixin):
    """DARTS encoder cell with fixed genotype (model_augment.py:16-62).

    ``fuse_siblings=True`` merges same-input std-conv edges into one
    wider conv each (see sibling_groups; exact, serving-oriented —
    variable layout differs, convert with ``fuse_sibling_variables``)."""

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    channels: int
    reduction: bool
    reduction_prev: bool
    dtype: Any = None
    fuse_siblings: bool = False
    sibling_families: tuple = DEFAULT_SIBLING_FAMILIES

    def setup(self):
        c, d = self.channels, self.dtype
        if self.reduction_prev:
            self.preprocess0 = FactorizedReduce(c, True, d)
        else:
            self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self._setup_edge_ops(c, d)

    def __call__(self, s0, s1, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        cache: dict = {}
        for i in range(len(self.edges) // 2):
            h1 = self._edge_out(2 * i, states, train, cache)
            h2 = self._edge_out(2 * i + 1, states, train, cache)
            states.append(h1 + h2)
        return jnp.concatenate([states[i] for i in self.concat], axis=-1)


class UpsampleCell(nn.Module, _SiblingMixin):
    """Decoder upsample cell (model_augment.py:64-106).

    ``s0`` is the coarser (half-resolution) feature; ops reading state 0 are
    followed by a 2x bilinear upsample (align_corners=True).
    ``fuse_siblings`` merges same-input std-conv edges (the released
    decoder genotypes are 1x1-conv-heavy); a fused group's 2x upsample
    runs ONCE on the concatenated output (resize is per-channel).
    """

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    c_prev: int  # channels of s1; node width is c_prev // 4
    dtype: Any = None
    fuse_siblings: bool = False
    sibling_families: tuple = DEFAULT_SIBLING_FAMILIES

    def setup(self):
        c, d = self.c_prev // 4, self.dtype
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self._setup_edge_ops(c, d)

    def _apply(self, i, states, train, cache):
        post = ((lambda y: resize_scale(y, 2.0, align_corners=True))
                if self.edges[i][1] == 0 else None)
        return self._edge_out(i, states, train, cache, post=post)

    def __call__(self, s0, s1, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        cache: dict = {}
        for i in range(len(self.edges) // 2):
            h1 = self._apply(2 * i, states, train, cache)
            h2 = self._apply(2 * i + 1, states, train, cache)
            states.append(h1 + h2)
        return jnp.concatenate([states[i] for i in self.concat], axis=-1)


class FusionCell(nn.Module, _SiblingMixin):
    """Refinement cell shared by pose/par branches (model_augment.py:119-229).

    Takes three preprocessed states, runs the fused genotype steps, and
    returns ``(fea1, fea2)`` = (concat of input states, concat of the
    ``concat`` nodes). ``order=0`` is the (unused in the released net)
    multi-scale variant that upsamples states 0/1. ``fuse_siblings``
    merges same-input std-conv edges (see sibling_groups).
    """

    edges: tuple[Edge, ...]
    concat: tuple[int, ...]
    channels: int
    order: int = 1
    dtype: Any = None
    fuse_siblings: bool = False
    sibling_families: tuple = DEFAULT_SIBLING_FAMILIES

    def setup(self):
        c, d = self.channels, self.dtype
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess2 = ReLUConvBN(c, 1, 1, 0, True, d)
        self._setup_edge_ops(c, d)

    def _apply(self, i, states, train, cache):
        post = None
        if self.order == 0:
            idx = self.edges[i][1]
            if idx == 0:
                post = lambda y: resize_scale(y, 4.0, align_corners=True)
            elif idx == 1:
                post = lambda y: resize_scale(y, 2.0, align_corners=True)
        return self._edge_out(i, states, train, cache, post=post)

    def __call__(self, s0, s1, s2, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        s2 = self.preprocess2(s2, train)
        states = [s0, s1, s2]
        cache: dict = {}
        for i in range(len(self.edges) // 2):
            h1 = self._apply(2 * i, states, train, cache)
            h2 = self._apply(2 * i + 1, states, train, cache)
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
