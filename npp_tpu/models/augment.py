"""NPPNet fixed (augment) network — genotype-compiled dual-task CNN.

TPU-native re-design of reference ``models/model_augment.py:231-574``: two
encoder streams (pose / parsing) of DARTS cells with cross-task injections at
four scales, genotype-compiled decoder upsample cells with decoder-stage
injections, four projection necks, and a chain of fusion refinement cells
with per-stage heads.

Differences from the reference by design:
- NHWC layout, bf16-friendly compute (params fp32);
- the whole forward is one static traced graph under ``jax.jit``;
- BatchNorm batch-stats reduce globally under a sharded-batch jit, matching
  the reference's SyncBN semantics without explicit collectives.

Forward returns ``(pose_list, par_list)`` where ``pose_list[s] = (pose_map,
pose_aux)`` and ``par_list[s] = (par_map, edge)`` for each refinement stage
``s`` (model_augment.py:555-574). Outputs are at 1/4 input resolution.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from npp_tpu import genotypes as gt
from npp_tpu.models.cells import (DEFAULT_SIBLING_FAMILIES,
    
    Cell,
    FusionCell,
    UpsampleCell,
    compile_decoder_injections,
    compile_encoder_injections,
)
from npp_tpu.ops.primitives import BatchNorm, Conv
from npp_tpu.ops.resize import resize_scale


class _Stem(nn.Module):
    """conv-BN-relu (stride-2) stem stage (model_augment.py:244-272)."""

    features: int
    stride: int
    final_relu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, (3, 3), (self.stride, self.stride), (1, 1),
                 use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(True, self.dtype)(x, train)
        if self.final_relu:
            x = nn.relu(x)
        return x


class _Neck(nn.Module):
    """ReLU - 1x1 conv - BN projection neck (model_augment.py:332-351)."""

    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(x)
        x = Conv(self.features, (1, 1), use_bias=True, dtype=self.dtype)(x)
        return BatchNorm(True, self.dtype)(x, train)


class _Head(nn.Module):
    """ReLU-conv-BN-ReLU-conv output head (model_augment.py:370-398)."""

    mid_features: int
    out_features: int
    mid_kernel: int = 1
    mid_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.mid_kernel
        x = nn.relu(x)
        x = Conv(self.mid_features, (k, k), padding=(k // 2, k // 2),
                 use_bias=self.mid_bias, dtype=self.dtype)(x)
        x = BatchNorm(True, self.dtype)(x, train)
        x = nn.relu(x)
        # Final conv in fp32 for stable logits/heatmaps.
        return Conv(self.out_features, (1, 1), use_bias=True,
                    dtype=jnp.float32)(x)


class NPPNet(nn.Module):
    """Fixed dual-task network compiled from the released genotypes.

    ``merged_streams=True`` stacks the two encoder streams' weights and
    runs each cell pair as ONE vmapped cell over a leading stream axis —
    XLA lowers the batched-kernel convs to grouped convs, halving the
    encoder's kernel count (a TPU-native optimization with no reference
    analog; parameter tree layout differs between the two modes).
    """

    num_classes: int = 20
    num_joints: int = 16
    layers: int = 16
    init_channels: int = 64
    refine_layers: int = 1
    encoder: gt.Genotype = gt.ENCODER
    decoder: gt.GenotypeUp2 = gt.DECODER
    inter: gt.GenotypeInter = gt.INTER
    fusion: gt.GenotypeFuse = gt.FUSION
    multiplier: int = 4
    merged_streams: bool = False
    fused_necks: bool = False
    fused_cells: bool = False
    sibling_families: tuple = DEFAULT_SIBLING_FAMILIES
    dtype: Any = jnp.bfloat16

    def setup(self):
        c, d, L = self.init_channels, self.dtype, self.layers

        # Encoder cell channel schedule (model_augment.py:274-297).
        boundaries = {L // 4 - 1, 2 * L // 4 - 1, 3 * L // 4 - 1, L - 1}
        reductions = {L // 4, 2 * L // 4, 3 * L // 4}
        c_curr = c // 2
        num_inchannels = []
        self._boundaries = tuple(sorted(boundaries))
        cell_args = []
        reduction_prev = False
        for i in range(L):
            reduction = i in reductions
            if reduction:
                c_curr *= 2
            cell_args.append((
                self.encoder.reduce if reduction else self.encoder.normal,
                self.encoder.reduce_concat if reduction
                else self.encoder.normal_concat,
                c_curr, reduction, reduction_prev, d))
            reduction_prev = reduction
            if i in boundaries:
                # Channels of the feature actually appended at this
                # boundary — i.e. AFTER this cell's reduction doubling.
                # The reference appends before the doubling
                # (model_augment.py:279-287), which agrees at L=8/16
                # (boundaries L//4-1 etc. are always one cell before
                # reductions L//4 etc.) but breaks at L=4, where a
                # boundary cell IS a reduction cell and the injection
                # ops would be built for stale widths.
                num_inchannels.append(c_curr * self.multiplier)

        if self.merged_streams:
            VCell = nn.vmap(Cell,
                            variable_axes={"params": 0, "batch_stats": 0},
                            split_rngs={"params": True},
                            in_axes=(0, 0, None), out_axes=0)
            VStem = nn.vmap(_Stem,
                            variable_axes={"params": 0, "batch_stats": 0},
                            split_rngs={"params": True},
                            in_axes=(0, None), out_axes=0)
            self.vstem_a = VStem(c, 2, True, d)
            self.vstem_b = VStem(c * 2, 2, True, d)
            self.vstem_c = VStem(c * 2, 1, False, d)
            self.vcells = [VCell(*a, fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
                           for a in cell_args]
        else:
            self.stem0 = _Stem(c, 2, True, d)
            self.stem1 = _Stem(c * 2, 2, True, d)
            self.stem2 = _Stem(c * 2, 1, False, d)
            self.stem3 = _Stem(c, 2, True, d)
            self.stem4 = _Stem(c * 2, 2, True, d)
            self.stem5 = _Stem(c * 2, 1, False, d)
            self.cells1 = [Cell(*a, fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
                           for a in cell_args]
            self.cells2 = [Cell(*a, fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
                           for a in cell_args]
        # Deep-to-shallow channel list [16C, 8C, 4C, 2C].
        self.num_inchannels = tuple(num_inchannels[::-1])
        shallow_first = tuple(num_inchannels)  # [2C, 4C, 8C, 16C]

        # Encoder-stage cross-task injections (model_augment.py:299-307).
        ops1, idx1 = compile_encoder_injections(self.inter.task1,
                                                shallow_first, d)
        ops2, idx2 = compile_encoder_injections(self.inter.task2,
                                                shallow_first, d)
        self.inj_ops1, self.inj_idx1 = ops1, idx1
        self.inj_ops2, self.inj_idx2 = ops2, idx2

        # Decoder-stage injections over the 7-slot pyramid
        # (model_augment.py:309-318).
        resolution = (1, 1 / 2, 1 / 4, 1 / 8, 1 / 4, 1 / 2, 1)
        channels7 = tuple(int(2 * c / r) for r in resolution)
        uops1, uidx1 = compile_decoder_injections(self.inter.task3,
                                                  resolution, channels7, d)
        uops2, uidx2 = compile_decoder_injections(self.inter.task4,
                                                  resolution, channels7, d)
        self.up_inj_ops1, self.up_inj_idx1 = uops1, uidx1
        self.up_inj_ops2, self.up_inj_idx2 = uops2, uidx2

        # Decoder upsample cells (model_augment.py:320-330).
        nc = self.num_inchannels
        self.upsamples1 = [
            UpsampleCell(self.decoder.upsample1, self.decoder.upsample_concat1,
                         nc[j + 1], d, fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
            for j in range(len(nc) - 1)
        ]
        self.upsamples2 = [
            UpsampleCell(self.decoder.upsample2, self.decoder.upsample_concat2,
                         nc[j + 1], d, fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
            for j in range(len(nc) - 1)
        ]

        # Necks (model_augment.py:332-351); nc[3] == 2C.
        # ``fused_necks`` channel-concatenates each stream's two neck convs
        # into ONE conv+BN (aux/edge channels first, then main): exact in
        # both modes — conv output channels are independent and BN moments
        # are per-channel — while reading the wide multi-scale concat
        # (16C channels) from HBM once instead of twice. Param layouts
        # interconvert exactly via ``fuse_neck_variables``.
        if self.fused_necks:
            self.neck1 = _Neck(7 * nc[3], d)
            self.neck2 = _Neck(7 * nc[3], d)
        else:
            self.pose_layer = _Neck(4 * nc[3], d)
            self.pose_auxlayer = _Neck(3 * nc[3], d)
            self.par_layer = _Neck(4 * nc[3], d)
            self.edge_layer = _Neck(3 * nc[3], d)

        # Refinement cells: 3 per refine iteration chain
        # (model_augment.py:354-363; the reference builds exactly 3 and
        # indexes 2*(i-1)+j which only works for refine_layers==1 — we build
        # the count the indexing actually needs).
        n_cells = 2 * max(self.refine_layers - 1, 0) + 3
        self.pose_net = [
            FusionCell(self.fusion.pose, self.fusion.pose_concat, nc[3], 1, d,
                       fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
            for _ in range(n_cells)
        ]
        self.par_net = [
            FusionCell(self.fusion.par, self.fusion.par_concat, nc[3], 1, d,
                       fuse_siblings=self.fused_cells,
                         sibling_families=self.sibling_families)
            for _ in range(n_cells)
        ]

        n_stages = self.refine_layers + 1
        self.pose_head = [
            _Head(256, self.num_joints, 1, True, d) for _ in range(n_stages)]
        self.pose_auxnet = [
            _Head(128, self.num_joints, 3, True, d) for _ in range(n_stages)]
        self.par_head = [
            _Head(256, self.num_classes, 1, True, d) for _ in range(n_stages)]
        self.edge_head = [
            _Head(6, 2, 3, False, d) for _ in range(n_stages)]

    def _inject(self, ops, idx_groups, offset_table, group, sources, train):
        """Weighted-sum free (discrete) injection: sum over compiled edges."""
        start = offset_table[group]
        z = 0.0
        for j, src_idx in enumerate(idx_groups[group]):
            z = z + ops[start + j](sources[src_idx], train)
        return z

    @staticmethod
    def _offsets(idx_groups):
        offs, acc = [], 0
        for g in idx_groups:
            offs.append(acc)
            acc += len(g)
        return tuple(offs)

    def _encode(self, x, train: bool):
        """Runs stems + encoder cells + cross-injections; returns the
        4-scale feature pyramids of both streams."""
        features1: list = []
        features2: list = []
        off1 = self._offsets(self.inj_idx1)
        off2 = self._offsets(self.inj_idx2)
        group = 0
        if self.merged_streams:
            xs = jnp.stack([x, x])
            s0s = self.vstem_b(self.vstem_a(xs, train), train)
            s1s = self.vstem_c(s0s, train)
            for i in range(self.layers):
                s0s, s1s = s1s, self.vcells[i](s0s, s1s, train)
                if i in self._boundaries:
                    features1.append(s1s[0])
                    features2.append(s1s[1])
                    z1 = self._inject(self.inj_ops1, self.inj_idx1, off1,
                                      group, features2, train)
                    z2 = self._inject(self.inj_ops2, self.inj_idx2, off2,
                                      group, features1, train)
                    features1[-1] = features1[-1] + z1
                    features2[-1] = features2[-1] + z2
                    s1s = jnp.stack([features1[-1], features2[-1]])
                    group += 1
            return features1, features2
        s0 = self.stem1(self.stem0(x, train), train)
        s1 = self.stem2(s0, train)
        s2 = self.stem4(self.stem3(x, train), train)
        s3 = self.stem5(s2, train)
        for i in range(self.layers):
            s0, s1 = s1, self.cells1[i](s0, s1, train)
            s2, s3 = s3, self.cells2[i](s2, s3, train)
            if i in self._boundaries:
                features1.append(s1)
                features2.append(s3)
                z1 = self._inject(self.inj_ops1, self.inj_idx1, off1, group,
                                  features2, train)
                z2 = self._inject(self.inj_ops2, self.inj_idx2, off2, group,
                                  features1, train)
                s1 = s1 + z1
                s3 = s3 + z2
                features1[-1] = s1
                features2[-1] = s3
                group += 1
        return features1, features2

    def __call__(self, x, train: bool = False):
        d = self.dtype
        x = x.astype(d)
        features1, features2 = self._encode(x, train)

        # Decoder: 3 upsample stages, each followed by cross-injection
        # (model_augment.py:451-533).
        uoff1 = self._offsets(self.up_inj_idx1)
        uoff2 = self._offsets(self.up_inj_idx2)
        out1, out2 = features1[3], features2[3]
        skip_idx = (2, 1, 0)
        for stage in range(3):
            out1 = self.upsamples1[stage](out1, features1[skip_idx[stage]],
                                          train)
            out2 = self.upsamples2[stage](out2, features2[skip_idx[stage]],
                                          train)
            features1.append(out1)
            features2.append(out2)
            z1 = self._inject(self.up_inj_ops1, self.up_inj_idx1, uoff1,
                              stage, features2, train)
            z2 = self._inject(self.up_inj_ops2, self.up_inj_idx2, uoff2,
                              stage, features1, train)
            out1 = out1 + z1
            out2 = out2 + z2
            features1[-1] = out1
            features2[-1] = out2

        # Multi-scale concat at 1/4 resolution (model_augment.py:538-543).
        x1 = jnp.concatenate([
            features1[0], features1[6],
            resize_scale(features1[5], 2.0, align_corners=True),
            resize_scale(features1[4], 4.0, align_corners=True),
        ], axis=-1)
        x2 = jnp.concatenate([
            features2[0], features2[6],
            resize_scale(features2[5], 2.0, align_corners=True),
            resize_scale(features2[4], 4.0, align_corners=True),
        ], axis=-1)

        if self.fused_necks:
            cut = 3 * self.num_inchannels[3]
            y1 = self.neck1(x1, train)
            y2 = self.neck2(x2, train)
            input1, input3 = y1[..., :cut], y1[..., cut:]
            input2, input4 = y2[..., :cut], y2[..., cut:]
        else:
            input1 = self.pose_auxlayer(x1, train)
            input2 = self.edge_layer(x2, train)
            input3 = self.pose_layer(x1, train)
            input4 = self.par_layer(x2, train)

        pose_list = [(self.pose_head[0](input3, train),
                      self.pose_auxnet[0](input1, train))]
        par_list = [(self.par_head[0](input4, train),
                     self.edge_head[0](input2, train))]

        for i in range(1, self.refine_layers + 1):
            for j in range(3):
                k = 2 * (i - 1) + j
                input1, tmp = self.pose_net[k](input1, input3, input4, train)
                input2, input4 = self.par_net[k](input2, input3, input4, train)
                input3 = tmp
            pose_list.append((self.pose_head[i](input3, train),
                              self.pose_auxnet[i](input1, train)))
            par_list.append((self.par_head[i](input4, train),
                             self.edge_head[i](input2, train)))

        return pose_list, par_list


def fuse_neck_variables(variables):
    """Exact unfused→fused neck variable transform.

    Concatenates ``pose_auxlayer``+``pose_layer`` → ``neck1`` and
    ``edge_layer``+``par_layer`` → ``neck2`` along the output-channel
    axis (conv kernels are HWIO, conv bias and every BN vector are
    per-output-channel, so ``axis=-1`` is correct for every leaf).
    Works on any variable collection dict (params + batch_stats).
    The transform is exact: ``NPPNet(fused_necks=True).apply(fused_vars)``
    equals the unfused forward in both train and eval modes
    (tests/test_model.py)."""
    import jax

    cat = lambda a, b: jax.tree.map(
        lambda p, q: jnp.concatenate([p, q], axis=-1), a, b)
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for fused, aux, main in (("neck1", "pose_auxlayer", "pose_layer"),
                                 ("neck2", "edge_layer", "par_layer")):
            if aux in tree and main in tree:
                tree[fused] = cat(tree.pop(aux), tree.pop(main))
        out[col] = tree
    return out


def unfuse_neck_variables(variables):
    """Exact inverse of :func:`fuse_neck_variables` — splits ``neck1`` /
    ``neck2`` back into the four per-task neck subtrees at the 3:4
    channel boundary (aux/edge channels first). Lets a model trained in
    the fused layout export reference-layout checkpoints."""
    import jax

    def split(tree):
        a = jax.tree.map(lambda p: p[..., :p.shape[-1] * 3 // 7], tree)
        b = jax.tree.map(lambda p: p[..., p.shape[-1] * 3 // 7:], tree)
        return a, b

    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for fused, aux, main in (("neck1", "pose_auxlayer", "pose_layer"),
                                 ("neck2", "edge_layer", "par_layer")):
            if fused in tree:
                tree[aux], tree[main] = split(tree.pop(fused))
        out[col] = tree
    return out


def merge_stream_variables(variables, layers: int):
    """Exact standard→``merged_streams`` variable transform.

    Works for both NPPNet and SearchNet (they share the naming scheme):
    stacks the two encoder streams' stem and per-cell subtrees leaf-wise
    on a NEW leading stream axis — ``vstem_a = stack(stem0, stem3)``,
    ``vstem_b = stack(stem1, stem4)``, ``vstem_c = stack(stem2, stem5)``,
    ``vcells_{i} = stack(cells1_{i}, cells2_{i})`` — exactly the layout
    ``nn.vmap``'s ``variable_axes={"params": 0, "batch_stats": 0}``
    expects. Exact in both modes: the vmapped cell runs each stream's
    weights on its own stream slice. Composes with
    :func:`fuse_sibling_variables` (apply that first; the stack is
    leaf-generic over the fused cell trees too)."""
    import jax

    pairs = [("vstem_a", "stem0", "stem3"), ("vstem_b", "stem1", "stem4"),
             ("vstem_c", "stem2", "stem5")]
    pairs += [(f"vcells_{i}", f"cells1_{i}", f"cells2_{i}")
              for i in range(layers)]
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for merged, a, b in pairs:
            if a in tree and b in tree:
                tree[merged] = jax.tree.map(
                    lambda p, q: jnp.stack([p, q]), tree.pop(a),
                    tree.pop(b))
        out[col] = tree
    return out


def unmerge_stream_variables(variables, layers: int):
    """Exact inverse of :func:`merge_stream_variables` (index the leading
    stream axis back into per-stream subtrees)."""
    import jax

    pairs = [("vstem_a", "stem0", "stem3"), ("vstem_b", "stem1", "stem4"),
             ("vstem_c", "stem2", "stem5")]
    pairs += [(f"vcells_{i}", f"cells1_{i}", f"cells2_{i}")
              for i in range(layers)]
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for merged, a, b in pairs:
            if merged in tree:
                node = tree.pop(merged)
                tree[a] = jax.tree.map(lambda p: p[0], node)
                tree[b] = jax.tree.map(lambda p: p[1], node)
        out[col] = tree
    return out


def _cell_specs(model: NPPNet):
    """(edges, reduction) per genotype-compiled cell module name, in the
    standard (unmerged-streams) layout — the grouping contract shared by
    ``fuse_sibling_variables`` and the ``fuse_siblings`` cell modules."""
    L = model.layers
    reductions = {L // 4, 2 * L // 4, 3 * L // 4}
    specs = {}
    for i in range(L):
        red = i in reductions
        edges = model.encoder.reduce if red else model.encoder.normal
        specs[f"cells1_{i}"] = (edges, red)
        specs[f"cells2_{i}"] = (edges, red)
    for j in range(3):
        specs[f"upsamples1_{j}"] = (model.decoder.upsample1, False)
        specs[f"upsamples2_{j}"] = (model.decoder.upsample2, False)
    n_cells = 2 * max(model.refine_layers - 1, 0) + 3
    for k in range(n_cells):
        specs[f"pose_net_{k}"] = (model.fusion.pose, False)
        specs[f"par_net_{k}"] = (model.fusion.par, False)
    return specs


def fuse_sibling_variables(variables, model: NPPNet):
    """Exact standard→``fused_cells`` variable transform.

    For every genotype-compiled cell, same-input sibling edge groups
    (``models.cells.sibling_groups``: std-conv, SE, dil-conv, and
    sep-conv families) concatenate their per-edge subtrees leaf-wise
    along the output-channel axis into one ``sib_{g}`` group-module
    subtree (conv kernels are HWIO — including depthwise (kh,kw,1,C) and
    grouped-pointwise (1,1,C,F) ones — and every BN vector is
    per-output-channel, so ``axis=-1`` is right for all leaves);
    remaining edges renumber densely to ``ops_{j}``.
    ``model`` supplies the genotypes/depth (a standard-layout NPPNet).
    Exact in both modes — tests/test_model.py."""
    import jax

    from npp_tpu.models.cells import sibling_groups

    specs = _cell_specs(model)
    families = getattr(model, "sibling_families", DEFAULT_SIBLING_FAMILIES)
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for cname, (edges, red) in specs.items():
            if cname not in tree:
                continue
            sub = dict(tree[cname])
            grouped = set()
            for g, (_key, es) in enumerate(
                    sibling_groups(edges, red, families)):
                grouped.update(es)
                # Per-collection presence guard: stride-1 se_connect
                # edges have params but no batch_stats (SEBlock gains a
                # BN only in reduce cells), so a group may be absent
                # from a collection entirely — all-or-none, since every
                # edge of a group is the same op.
                parts = [sub.pop(f"ops_{e}") for e in es
                         if f"ops_{e}" in sub]
                if parts:
                    sub[f"sib_{g}"] = jax.tree.map(
                        lambda *ps: jnp.concatenate(ps, axis=-1), *parts)
            pos = 0
            for e in range(len(edges)):
                if e in grouped:
                    continue
                if f"ops_{e}" in sub:
                    sub[f"ops_{pos}"] = sub.pop(f"ops_{e}") \
                        if pos != e else sub[f"ops_{e}"]
                pos += 1
            tree[cname] = sub
        out[col] = tree
    return out


def unfuse_sibling_variables(variables, model: NPPNet):
    """Exact inverse of :func:`fuse_sibling_variables` (split each
    ``sib_{g}`` subtree back into per-edge ReLUConvBN subtrees and
    restore original ``ops_{e}`` numbering)."""
    import jax

    from npp_tpu.models.cells import sibling_groups

    specs = _cell_specs(model)
    families = getattr(model, "sibling_families", DEFAULT_SIBLING_FAMILIES)
    out = {}
    for col, tree in variables.items():
        tree = dict(tree)
        for cname, (edges, red) in specs.items():
            if cname not in tree:
                continue
            sub = dict(tree[cname])
            groups = sibling_groups(edges, red, families)
            grouped = {e for _k, es in groups for e in es}
            # Un-renumber the non-grouped ops (reverse order so moves
            # never clobber: new index <= original index always).
            remaining = [e for e in range(len(edges)) if e not in grouped]
            for pos in range(len(remaining) - 1, -1, -1):
                e = remaining[pos]
                if pos != e and f"ops_{pos}" in sub:
                    sub[f"ops_{e}"] = sub.pop(f"ops_{pos}")
            for g, (_key, es) in enumerate(groups):
                if f"sib_{g}" not in sub:
                    continue  # group absent from this collection (see
                    # fuse_sibling_variables: stride-1 SE batch_stats)
                node = sub.pop(f"sib_{g}")
                k = len(es)
                for s_i, e in enumerate(es):
                    sub[f"ops_{e}"] = jax.tree.map(
                        lambda p, s_i=s_i, k=k: p[
                            ..., s_i * (p.shape[-1] // k):
                            (s_i + 1) * (p.shape[-1] // k)], node)
            tree[cname] = sub
        out[col] = tree
    return out


def build_model(cfg, search: bool = False, inter=None,
                fusion=None, fused_necks: bool = False) -> NPPNet:
    """Construct an NPPNet from a Config (augment_lip_sync.py:190).

    ``inter``/``fusion`` override the released genotypes — the handoff from
    a search run (the reference hard-codes search results into
    genotypes.py; here they flow via genotype JSON files).
    ``fused_necks`` selects the fused-neck layout (exact; convert
    existing checkpoints with ``fuse_neck_variables``)."""
    section = cfg.search if search else cfg.train
    kw = {"fused_necks": fused_necks}
    if inter is not None:
        kw["inter"] = inter
    if fusion is not None:
        kw["fusion"] = fusion
    return NPPNet(
        num_classes=cfg.dataset.num_classes,
        num_joints=cfg.dataset.num_joints,
        layers=section.layers,
        init_channels=section.init_channels,
        refine_layers=cfg.model.refine_layers,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32,
        **kw,
    )
