"""NPPNet supernet — differentiable search over inter-task connections.

TPU-native re-design of reference ``models/model_search_interact.py``:
- fixed encoder/decoder cells (gt.ENCODER / gt.DECODER) as in the released
  search ("we only release the search of interaction", README.md:12);
- searchable cross-task injections at 4 encoder scales and 3 decoder
  stages as ``MixedOp`` weighted sums over PRIMITIVES_INTER with the
  partial-channel trick (model_search_interact.py:39-74): ops run on half
  the channels, the other half passes through, channel-shuffle recombines;
- searchable refinement cells (PoseCell/ParCell,
  model_search_interact.py:332-430);
- architecture parameters (alphas/betas, ``_initialize_alphas``:772-804)
  are flax params named ``alphas*``/``betas*`` so an optax label fn can
  route them to the arch optimizer (search_lip_sync.py:273-279);
- genotype extraction and the entropy regularizer are host-side numpy
  (npp_tpu.models.genotype_parse).

Everything is statically unrolled: alpha/beta softmaxes stay inside the
single jitted train step (SURVEY.md §7 'supernet jit-ability').
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from npp_tpu import genotypes as gt
from npp_tpu.models.cells import Cell, UpsampleCell
from npp_tpu.models.augment import _Head, _Neck, _Stem
from npp_tpu.ops.pooling import max_pool
from npp_tpu.ops.primitives import BatchNorm, Conv, make_op
from npp_tpu.ops.resize import resize_nearest, resize_scale, scale_output_size


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """NHWC channel shuffle (model_search_interact.py:22-36)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, -1, -2)
    return x.reshape(b, h, w, c)


class MixedOp(nn.Module):
    """Partial-channel mixed op (model_search_interact.py:39-74).

    Candidates run on the first half of the channels (affine-free BNs);
    the second half passes through (nearest-resized when the edge crosses
    scales — the reference's default-mode F.interpolate at :64); channel
    shuffle recombines; optional 1x1 adapter projects to the destination
    width.
    """

    channels: int  # source channel count C (ops run on C // 2)
    up_scale: Optional[float] = None
    extra_features: Optional[int] = None  # adapter output width
    primitives: tuple = gt.PRIMITIVES_INTER
    dtype: Any = None

    def setup(self):
        half = self.channels // 2
        ops = []
        for prim in self.primitives:
            op = make_op(prim, half, 1, False, self.dtype)
            ops.append(op)
        self.ops = ops
        # 'pool' primitives get an extra affine-free BN appended
        # (model_search_interact.py:48-49).
        self.extra_bns = [BatchNorm(False, self.dtype)
                          for prim in self.primitives if "pool" in prim]
        if self.extra_features is not None:
            self.proj = Conv(self.extra_features, (1, 1), use_bias=True,
                             dtype=self.dtype)

    def __call__(self, x, weights, train: bool):
        half = self.channels // 2
        xt, xt2 = x[..., :half], x[..., half:]
        out = None
        bn_i = 0
        for i, prim in enumerate(self.primitives):
            y = self.ops[i](xt, train)
            if "pool" in prim:
                y = self.extra_bns[bn_i](y, train)
                bn_i += 1
            if self.up_scale:
                h = scale_output_size(y.shape[1], self.up_scale)
                w = scale_output_size(y.shape[2], self.up_scale)
                y = resize_scale(y, self.up_scale, align_corners=True) \
                    if (h, w) != (y.shape[1], y.shape[2]) else y
            term = weights[i] * y
            out = term if out is None else out + term
        if self.up_scale:
            h = scale_output_size(xt2.shape[1], self.up_scale)
            w = scale_output_size(xt2.shape[2], self.up_scale)
            xt2 = resize_nearest(xt2, (h, w))
        if out.shape[1] != xt2.shape[1]:
            xt2 = max_pool(xt2, 2, 2, 0)
        ans = jnp.concatenate([out, xt2], axis=-1)
        ans = channel_shuffle(ans, 2)
        if self.extra_features is not None:
            ans = self.proj(ans)
        return ans


class MixedOpCore(nn.Module):
    """The primitive-mixing core of MixedOp: candidates on the first half
    of the channels at SOURCE resolution, pool-BNs, alpha-weighted sum.
    No resize, no passthrough, no proj — those are per-destination tails
    handled by InjectionGroup. Splitting them out is what makes the core
    vmappable across (stream, destination) pairs: every injection op
    reading one source slot shares this exact computation shape."""

    channels: int  # source channel count C (ops run on C // 2)
    primitives: tuple = gt.PRIMITIVES_INTER
    dtype: Any = None

    def setup(self):
        half = self.channels // 2
        self.ops = [make_op(prim, half, 1, False, self.dtype)
                    for prim in self.primitives]
        self.extra_bns = [BatchNorm(False, self.dtype)
                          for prim in self.primitives if "pool" in prim]

    def __call__(self, xt, weights, train: bool):
        out = None
        bn_i = 0
        for i, prim in enumerate(self.primitives):
            y = self.ops[i](xt, train)
            if "pool" in prim:
                y = self.extra_bns[bn_i](y, train)
                bn_i += 1
            term = weights[i] * y
            out = term if out is None else out + term
        return out


class InjectionGroup(nn.Module):
    """All OFF-DIAGONAL injection MixedOps reading one source slot,
    vmapped over (stream, destination) pairs (VERDICT r3 item 4; the
    reference unrolls each as a separate module,
    model_search_interact.py:501-556).

    Equivalence to per-edge MixedOps: the bilinear cross-scale resize is
    linear, so ``resize(sum_p w_p y_p) == sum_p w_p resize(y_p)`` — the
    alpha-weighted primitive sum runs at source resolution inside one
    vmapped core (2*D stacked param sets), and the per-destination tail
    (resize out-half bilinear / pass-half nearest, channel shuffle, 1x1
    proj) stays unrolled. Betas are applied by the caller, preserving the
    original accumulation order.

    Stacking order along the vmap axis: [stream1 dests ascending,
    stream2 dests ascending] — mirrored by
    utils.torch_convert.convert_injection_layout.
    """

    channels: int                 # source channel count C
    up_scales: tuple              # per destination (len D)
    extras: tuple                 # per destination proj width (len D)
    dtype: Any = None

    def setup(self):
        VCore = nn.vmap(MixedOpCore,
                        variable_axes={"params": 0, "batch_stats": 0},
                        split_rngs={"params": True},
                        in_axes=(0, 0, None), out_axes=0)
        self.core = VCore(self.channels, dtype=self.dtype)
        # Flat proj list, [stream1 dests..., stream2 dests...] like the
        # core's stacked axis. Off-diagonal edges always cross scales, so
        # extras are always set — but tolerate None for generality.
        self.projs = [Conv(e, (1, 1), use_bias=True, dtype=self.dtype)
                      if e is not None else None
                      for _ in range(2) for e in self.extras]

    def __call__(self, x1, x2, weights1, weights2, train: bool):
        """x1/x2: the source feature as seen by stream-1/stream-2 ops
        (stream 1 injects FROM the other branch: x1 = features2[j]).
        weights{s}: (D, n_primitives) alpha rows, dest-ascending.
        Returns (contribs1, contribs2): per-destination outputs, unscaled
        by beta."""
        D = len(self.up_scales)
        half = self.channels // 2
        xt1, pass1 = x1[..., :half], x1[..., half:]
        xt2, pass2 = x2[..., :half], x2[..., half:]
        stacked_x = jnp.concatenate([
            jnp.broadcast_to(xt1[None], (D,) + xt1.shape),
            jnp.broadcast_to(xt2[None], (D,) + xt2.shape)])
        stacked_w = jnp.concatenate([weights1, weights2])
        outs = self.core(stacked_x, stacked_w, train)  # (2D, B, H, W, C/2)

        def tail(out, xt2_pass, up, proj):
            # Exactly MixedOp.__call__'s post-primitive path, with the
            # (linear) bilinear resize applied once to the weighted sum.
            if up:
                h = scale_output_size(out.shape[1], up)
                w = scale_output_size(out.shape[2], up)
                if (h, w) != (out.shape[1], out.shape[2]):
                    out = resize_scale(out, up, align_corners=True)
                xt2_pass = resize_nearest(xt2_pass, (h, w))
            if out.shape[1] != xt2_pass.shape[1]:
                xt2_pass = max_pool(xt2_pass, 2, 2, 0)
            ans = jnp.concatenate([out, xt2_pass], axis=-1)
            ans = channel_shuffle(ans, 2)
            return proj(ans) if proj is not None else ans

        contribs1 = [tail(outs[d], pass1, self.up_scales[d], self.projs[d])
                     for d in range(D)]
        contribs2 = [tail(outs[D + d], pass2, self.up_scales[d],
                          self.projs[D + d]) for d in range(D)]
        return contribs1, contribs2


class SearchFusionCell(nn.Module):
    """Searchable refinement cell (PoseCell/ParCell,
    model_search_interact.py:332-430): 4 steps, step i sums (3+i) MixedOps
    over all prior states, weighted by per-edge betas."""

    channels: int
    steps: int = 4
    multiplier: int = 4
    dtype: Any = None

    def setup(self):
        c, d = self.channels, self.dtype
        from npp_tpu.ops.primitives import ReLUConvBN
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess2 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.ops = [MixedOp(c, dtype=d)
                    for i in range(self.steps) for _ in range(3 + i)]

    def __call__(self, s0, s1, s2, alpha_w, beta_w, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        s2 = self.preprocess2(s2, train)
        states = [s0, s1, s2]
        offset = 0
        for i in range(self.steps):
            s = None
            for j, h in enumerate(states):
                term = beta_w[offset + j] * self.ops[offset + j](
                    h, alpha_w[offset + j], train)
                s = term if s is None else s + term
            offset += len(states)
            states.append(s)
        fea1 = jnp.concatenate(states[0:3], axis=-1)
        fea2 = jnp.concatenate(states[-self.multiplier:], axis=-1)
        return fea1, fea2


class VSearchFusionCell(nn.Module):
    """SearchFusionCell with each step's (3+i) MixedOps VMAPPED over one
    stacked edge axis — numerically identical (independent params per
    edge), but the traced graph holds 4 batched MixedOps instead of 18
    separate ones. XLA lowers the stacked convs to batched kernels; trace
    time, HLO size, and compile-helper memory drop ~4x per cell, which is
    what lets the reference-scale (L=16/C=32/384px) bi-level program
    compile on one chip's toolchain."""

    channels: int
    steps: int = 4
    multiplier: int = 4
    dtype: Any = None

    def setup(self):
        c, d = self.channels, self.dtype
        from npp_tpu.ops.primitives import ReLUConvBN
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess2 = ReLUConvBN(c, 1, 1, 0, True, d)
        VMixed = nn.vmap(MixedOp,
                         variable_axes={"params": 0, "batch_stats": 0},
                         split_rngs={"params": True},
                         in_axes=(0, 0, None), out_axes=0)
        self.step_ops = [VMixed(c, dtype=d) for _ in range(self.steps)]

    def __call__(self, s0, s1, s2, alpha_w, beta_w, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        s2 = self.preprocess2(s2, train)
        states = [s0, s1, s2]
        offset = 0
        for i in range(self.steps):
            n = len(states)
            stacked = jnp.stack(states)               # (n, B, H, W, C)
            outs = self.step_ops[i](stacked, alpha_w[offset:offset + n],
                                    train)            # (n, B, H, W, C)
            # Sequential weighted sum, matching the unrolled cell's
            # accumulation order exactly.
            s = None
            for j in range(n):
                term = beta_w[offset + j] * outs[j]
                s = term if s is None else s + term
            offset += n
            states.append(s)
        fea1 = jnp.concatenate(states[0:3], axis=-1)
        fea2 = jnp.concatenate(states[-self.multiplier:], axis=-1)
        return fea1, fea2


def btw_weights(betas: jnp.ndarray, n_input: int, steps: int) -> jnp.ndarray:
    """Per-step softmax over growing beta groups
    (model_search_interact.py:1054-1065)."""
    import jax

    out = []
    start, n = 0, n_input
    for _ in range(steps):
        out.append(jax.nn.softmax(betas[start:start + n]))
        start += n
        n += 1
    return jnp.concatenate(out, axis=0)


class SearchNet(nn.Module):
    """The interaction-search supernet (model_search_interact.py:432-770)."""

    num_classes: int = 20
    num_joints: int = 16
    layers: int = 16
    init_channels: int = 32
    refine_layers: int = 1
    steps: int = 4
    multiplier: int = 4
    encoder: gt.Genotype = gt.ENCODER
    decoder: gt.GenotypeUp2 = gt.DECODER
    remat: bool = True
    vmap_fusion: bool = True
    vmap_injections: bool = True
    merged_streams: bool = False
    dtype: Any = jnp.bfloat16

    # Off-diagonal decoder-injection destinations for source slot j
    # (group i injects into slot 4+i; j == 4+i is the diagonal).
    @staticmethod
    def _dec_dests(j: int) -> tuple:
        return tuple(range(3)) if j <= 3 else tuple(range(j - 3, 3))

    def setup(self):
        c, d, L = self.init_channels, self.dtype, self.layers
        # Rematerialize cells/mixed-ops in the backward pass: the supernet
        # executes EVERY candidate primitive per edge (model_search_
        # interact.py:61), so stored activations at the reference scale
        # (L=16, C=32, bs 7, 384px) exceed one chip's HBM. jax.checkpoint
        # trades ~1/3 more FLOPs for fitting the bi-level gradient program.
        Fusion = (VSearchFusionCell if self.vmap_fusion
                  else SearchFusionCell)
        if self.remat:
            RCell = nn.remat(Cell, static_argnums=(3,))
            RMixed = nn.remat(MixedOp, static_argnums=(3,))
            RFusion = nn.remat(Fusion, static_argnums=(6,))
        else:
            RCell, RMixed, RFusion = Cell, MixedOp, Fusion
        if self.merged_streams:
            # Stream-merged encoder (the NPPNet merged_streams design
            # applied to the supernet): each cell PAIR runs as one
            # vmapped cell over a leading stream axis, halving the
            # encoder's op/HLO count. The supernet runs at C=32 — the
            # width where the fixed net measured the merged encoder
            # fastest — and the encoder cells are fixed (not searched),
            # so only the plumbing changes; injections/decoder/fusion
            # are per-stream as before. Parameter layout differs
            # (vcells_{i} stacked) — serving/search checkpoints don't
            # interchange without a stack/unstack transform.
            VRCell = nn.vmap(RCell,
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
        else:
            self.stem0 = _Stem(c, 2, True, d)
            self.stem1 = _Stem(c * 2, 2, True, d)
            self.stem2 = _Stem(c * 2, 1, False, d)
            self.stem3 = _Stem(c, 2, True, d)
            self.stem4 = _Stem(c * 2, 2, True, d)
            self.stem5 = _Stem(c * 2, 1, False, d)

        boundaries = {L // 4 - 1, 2 * L // 4 - 1, 3 * L // 4 - 1, L - 1}
        reductions = {L // 4, 2 * L // 4, 3 * L // 4}
        self._boundaries = tuple(sorted(boundaries))
        c_curr = c // 2
        cells1, cells2, num_inchannels = [], [], []
        reduction_prev = False
        for i in range(L):
            reduction = i in reductions
            if reduction:
                c_curr *= 2
            if i in boundaries:
                # AFTER the reduction doubling: the channels of the
                # feature appended at this boundary. Same at L=8/16 as
                # the reference's append-before order; correct (unlike
                # it) when a boundary cell IS a reduction cell (L=4) —
                # see models/augment.py setup note.
                num_inchannels.append(c_curr * self.multiplier)
            edges = (self.encoder.reduce if reduction
                     else self.encoder.normal)
            concat = (self.encoder.reduce_concat if reduction
                      else self.encoder.normal_concat)
            if self.merged_streams:
                # VRCell from the merged branch above (same setup scope).
                cells1.append(VRCell(edges, concat, c_curr, reduction,
                                     reduction_prev, d))
            else:
                cells1.append(RCell(edges, concat, c_curr, reduction,
                                    reduction_prev, d))
                cells2.append(RCell(edges, concat, c_curr, reduction,
                                    reduction_prev, d))
            reduction_prev = reduction
        if self.merged_streams:
            self.vcells = cells1
        else:
            self.cells1 = cells1
            self.cells2 = cells2
        self.num_inchannels = tuple(num_inchannels[::-1])  # [16C,8C,4C,2C]
        nc = self.num_inchannels

        # Searchable encoder-stage injections: group i has (1+i) MixedOps,
        # source j at shallow-first index (model_search_interact.py:501-520).
        if self.vmap_injections:
            # Vmapped layout (VERDICT r3 item 4): per dest group, the
            # diagonal (source == dest, pre-update input) MixedOps of the
            # two streams vmap together; per SOURCE slot, all off-diagonal
            # ops vmap over (stream, destination) in one InjectionGroup —
            # they share the source's shape exactly.
            VMixedPair = nn.vmap(
                MixedOp, variable_axes={"params": 0, "batch_stats": 0},
                split_rngs={"params": True}, in_axes=(0, 0, None),
                out_axes=0)
            if self.remat:
                RDiag = nn.remat(VMixedPair, static_argnums=(3,))
                RGroup = nn.remat(InjectionGroup, static_argnums=(5,))
            else:
                RDiag, RGroup = VMixedPair, InjectionGroup
            self.inj_diag = [RDiag(nc[3 - i], 1.0, dtype=d)
                             for i in range(4)]
            self.inj_grp = [
                RGroup(nc[3 - j],
                       tuple(1 / 2 ** (i - j) for i in range(j + 1, 4)),
                       tuple(nc[3 - i] for i in range(j + 1, 4)), dtype=d)
                for j in range(3)]
        else:
            ops1, ops2 = [], []
            for i in range(4):
                for j in range(1 + i):
                    up = 1 / 2 ** (i - j)
                    extra = nc[3 - i] if i != j else None
                    ops1.append(RMixed(nc[3 - j], up, extra, dtype=d))
                    ops2.append(RMixed(nc[3 - j], up, extra, dtype=d))
            self.inj_ops1, self.inj_ops2 = ops1, ops2

        # Fixed decoder upsample cells (:522-532).
        self.upsamples1 = [
            UpsampleCell(self.decoder.upsample1,
                         self.decoder.upsample_concat1, nc[j + 1], d)
            for j in range(3)]
        self.upsamples2 = [
            UpsampleCell(self.decoder.upsample2,
                         self.decoder.upsample_concat2, nc[j + 1], d)
            for j in range(3)]

        # Searchable decoder-stage injections over the 7-slot pyramid
        # (:534-556).
        resolution = (1, 1 / 2, 1 / 4, 1 / 8, 1 / 4, 1 / 2, 1)
        channels7 = tuple(int(2 * c / r) for r in resolution)
        if self.vmap_injections:
            self.up_diag = [RDiag(channels7[4 + i], 1.0, dtype=d)
                            for i in range(3)]
            self.up_grp = [
                RGroup(channels7[j],
                       tuple(resolution[4 + i] / resolution[j]
                             for i in self._dec_dests(j)),
                       tuple(channels7[4 + i] for i in self._dec_dests(j)),
                       dtype=d)
                for j in range(6)]
        else:
            uops1, uops2 = [], []
            for i in range(3):
                for j in range(5 + i):
                    up = resolution[4 + i] / resolution[j]
                    extra = channels7[4 + i] if (4 + i) != j else None
                    uops1.append(RMixed(channels7[j], up, extra, dtype=d))
                    uops2.append(RMixed(channels7[j], up, extra, dtype=d))
            self.up_inj_ops1, self.up_inj_ops2 = uops1, uops2

        self.pose_layer = _Neck(4 * nc[3], d)
        self.pose_auxlayer = _Neck(3 * nc[3], d)
        self.par_layer = _Neck(4 * nc[3], d)
        self.edge_layer = _Neck(3 * nc[3], d)

        self.pose_net = [RFusion(nc[3], dtype=d) for _ in range(3)]
        self.par_net = [RFusion(nc[3], dtype=d) for _ in range(3)]

        n_stages = self.refine_layers + 1
        self.pose_head = [_Head(256, self.num_joints, 1, True, d)
                          for _ in range(n_stages)]
        self.pose_auxnet = [_Head(128, self.num_joints, 3, True, d)
                            for _ in range(n_stages)]
        self.par_head = [_Head(256, self.num_classes, 1, True, d)
                         for _ in range(n_stages)]
        self.edge_head = [_Head(6, 2, 3, False, d) for _ in range(n_stages)]

        # Architecture parameters (:772-804).
        num_ops = len(gt.PRIMITIVES_INTER)
        k = sum(3 + i for i in range(self.steps))  # 18
        init = nn.initializers.constant(1e-3)
        self.alphas1 = self.param("alphas1", init, (10, num_ops))
        self.alphas2 = self.param("alphas2", init, (10, num_ops))
        self.alphas3 = self.param("alphas3", init, (18, num_ops))
        self.alphas4 = self.param("alphas4", init, (18, num_ops))
        self.betas1 = self.param("betas1", init, (10,))
        self.betas2 = self.param("betas2", init, (10,))
        self.betas3 = self.param("betas3", init, (18,))
        self.betas4 = self.param("betas4", init, (18,))
        self.alphas_pose = self.param("alphas_pose", init, (k, num_ops))
        self.alphas_par = self.param("alphas_par", init, (k, num_ops))
        self.betas_pose = self.param("betas_pose", init, (k,))
        self.betas_par = self.param("betas_par", init, (k,))

    def __call__(self, x, train: bool = False):
        import jax

        from npp_tpu.ops import pooling

        # Shift-based pools win in the supernet (unfused small-channel
        # MixedOp pools + select_and_scatter backward; bi-level step
        # 1.82 -> 1.64 s measured) but lose in the fixed net — opt in
        # here, at trace time, for this forward only.
        with pooling.shift_pools():
            return self._forward(x, train)

    def _forward(self, x, train: bool):
        import jax

        d = self.dtype
        x = x.astype(d)
        if self.merged_streams:
            xs = jnp.stack([x, x])
            s0s = self.vstem_b(self.vstem_a(xs, train), train)
            s1s = self.vstem_c(s0s, train)
        else:
            s0 = self.stem1(self.stem0(x, train), train)
            s1 = self.stem2(s0, train)
            s2 = self.stem4(self.stem3(x, train), train)
            s3 = self.stem5(s2, train)

        softmax = jax.nn.softmax
        features1, features2 = [], []
        offset = 0
        # Vmapped-injection bookkeeping: pending{s}[j] holds source j's
        # off-diagonal contributions (dest-ascending), computed once the
        # source is final (post its own group's update) and consumed at
        # the later destinations' boundaries. Row-wise softmax of the full
        # alpha matrices equals the per-group slice softmax.
        offsets_e = (0, 1, 3, 6)
        if self.vmap_injections:
            W1 = softmax(self.alphas1, axis=-1)
            W2 = softmax(self.alphas2, axis=-1)
        pending1, pending2 = {}, {}
        group = 0
        for i in range(self.layers):
            if self.merged_streams:
                s0s, s1s = s1s, self.vcells[i](s0s, s1s, train)
                s1, s3 = s1s[0], s1s[1]
            else:
                s0, s1 = s1, self.cells1[i](s0, s1, train)
                s2, s3 = s3, self.cells2[i](s2, s3, train)
            if i in self._boundaries:
                features1.append(s1)
                features2.append(s3)
                n = len(features1)
                if self.vmap_injections:
                    g = group
                    b1 = softmax(self.betas1[offset:offset + n], axis=-1)
                    b2 = softmax(self.betas2[offset:offset + n], axis=-1)
                    # Diagonal (source g, pre-update), both streams.
                    douts = self.inj_diag[g](
                        jnp.stack([features2[g], features1[g]]),
                        jnp.stack([W1[offset + g], W2[offset + g]]), train)
                    z1, z2 = None, None
                    for j in range(n):
                        c1 = (pending1[j][g - j - 1] if j < g else douts[0])
                        c2 = (pending2[j][g - j - 1] if j < g else douts[1])
                        t1, t2 = b1[j] * c1, b2[j] * c2
                        z1 = t1 if z1 is None else z1 + t1
                        z2 = t2 if z2 is None else z2 + t2
                    s1 = s1 + z1
                    s3 = s3 + z2
                    features1[-1] = s1
                    features2[-1] = s3
                    if self.merged_streams:
                        s1s = jnp.stack([s1, s3])
                    if g < 3:
                        # Source g is now final: its contributions to all
                        # later destinations in one vmapped group.
                        rows1 = jnp.stack([W1[offsets_e[i2] + g]
                                           for i2 in range(g + 1, 4)])
                        rows2 = jnp.stack([W2[offsets_e[i2] + g]
                                           for i2 in range(g + 1, 4)])
                        pending1[g], pending2[g] = self.inj_grp[g](
                            features2[g], features1[g], rows1, rows2, train)
                    group += 1
                    offset += n
                    continue
                w1 = softmax(self.alphas1[offset:offset + n], axis=-1)
                b1 = softmax(self.betas1[offset:offset + n], axis=-1)
                w2 = softmax(self.alphas2[offset:offset + n], axis=-1)
                b2 = softmax(self.betas2[offset:offset + n], axis=-1)
                z1, z2 = None, None
                for j in range(n):
                    t1 = b1[j] * self.inj_ops1[offset + j](
                        features2[j], w1[j], train)
                    t2 = b2[j] * self.inj_ops2[offset + j](
                        features1[j], w2[j], train)
                    z1 = t1 if z1 is None else z1 + t1
                    z2 = t2 if z2 is None else z2 + t2
                s1 = s1 + z1
                s3 = s3 + z2
                features1[-1] = s1
                features2[-1] = s3
                if self.merged_streams:
                    s1s = jnp.stack([s1, s3])
                offset += n

        cont = 0
        out1, out2 = features1[3], features2[3]
        skip_idx = (2, 1, 0)
        offsets_d = (0, 5, 11)
        upend1, upend2 = {}, {}
        if self.vmap_injections:
            W3 = softmax(self.alphas3, axis=-1)
            W4 = softmax(self.alphas4, axis=-1)
            # Encoder features 0..3 are final: their contributions to all
            # three decoder destinations, one vmapped group per source.
            for j in range(4):
                rows1 = jnp.stack([W3[offsets_d[i2] + j] for i2 in range(3)])
                rows2 = jnp.stack([W4[offsets_d[i2] + j] for i2 in range(3)])
                upend1[j], upend2[j] = self.up_grp[j](
                    features2[j], features1[j], rows1, rows2, train)
        for stage in range(3):
            out1 = self.upsamples1[stage](out1, features1[skip_idx[stage]],
                                          train)
            out2 = self.upsamples2[stage](out2, features2[skip_idx[stage]],
                                          train)
            features1.append(out1)
            features2.append(out2)
            n = len(features1)
            if self.vmap_injections:
                b1 = softmax(self.betas3[cont:cont + n], axis=-1)
                b2 = softmax(self.betas4[cont:cont + n], axis=-1)
                diag = 4 + stage
                douts = self.up_diag[stage](
                    jnp.stack([features2[diag], features1[diag]]),
                    jnp.stack([W3[cont + diag], W4[cont + diag]]), train)
                z1, z2 = None, None
                for j in range(n):
                    if j == diag:
                        c1, c2 = douts[0], douts[1]
                    else:
                        d_idx = stage - (0 if j <= 3 else j - 3)
                        c1, c2 = upend1[j][d_idx], upend2[j][d_idx]
                    t1, t2 = b1[j] * c1, b2[j] * c2
                    z1 = t1 if z1 is None else z1 + t1
                    z2 = t2 if z2 is None else z2 + t2
                out1 = out1 + z1
                out2 = out2 + z2
                features1[-1] = out1
                features2[-1] = out2
                if stage < 2:
                    j = 4 + stage  # this slot is now final
                    dests = self._dec_dests(j)
                    rows1 = jnp.stack([W3[offsets_d[i2] + j]
                                       for i2 in dests])
                    rows2 = jnp.stack([W4[offsets_d[i2] + j]
                                       for i2 in dests])
                    upend1[j], upend2[j] = self.up_grp[j](
                        features2[j], features1[j], rows1, rows2, train)
                cont += n
                continue
            w1 = softmax(self.alphas3[cont:cont + n], axis=-1)
            b1 = softmax(self.betas3[cont:cont + n], axis=-1)
            w2 = softmax(self.alphas4[cont:cont + n], axis=-1)
            b2 = softmax(self.betas4[cont:cont + n], axis=-1)
            z1, z2 = None, None
            for j in range(n):
                t1 = b1[j] * self.up_inj_ops1[cont + j](
                    features2[j], w1[j], train)
                t2 = b2[j] * self.up_inj_ops2[cont + j](
                    features1[j], w2[j], train)
                z1 = t1 if z1 is None else z1 + t1
                z2 = t2 if z2 is None else z2 + t2
            out1 = out1 + z1
            out2 = out2 + z2
            features1[-1] = out1
            features2[-1] = out2
            cont += n

        x1 = jnp.concatenate([
            features1[0], features1[6],
            resize_scale(features1[5], 2.0, align_corners=True),
            resize_scale(features1[4], 4.0, align_corners=True)], axis=-1)
        x2 = jnp.concatenate([
            features2[0], features2[6],
            resize_scale(features2[5], 2.0, align_corners=True),
            resize_scale(features2[4], 4.0, align_corners=True)], axis=-1)

        input1 = self.pose_auxlayer(x1, train)
        input2 = self.edge_layer(x2, train)
        input3 = self.pose_layer(x1, train)
        input4 = self.par_layer(x2, train)

        pose_list = [(self.pose_head[0](input3, train),
                      self.pose_auxnet[0](input1, train))]
        par_list = [(self.par_head[0](input4, train),
                     self.edge_head[0](input2, train))]

        w_pose = softmax(self.alphas_pose, axis=-1)
        b_pose = btw_weights(self.betas_pose, 3, self.steps)
        w_par = softmax(self.alphas_par, axis=-1)
        b_par = btw_weights(self.betas_par, 3, self.steps)
        for i in range(1, self.refine_layers + 1):
            for j in range(3):
                k = 2 * (i - 1) + j
                input1, tmp = self.pose_net[k](input1, input3, input4,
                                               w_pose, b_pose, train)
                input2, input4 = self.par_net[k](input2, input3, input4,
                                                 w_par, b_par, train)
                input3 = tmp
            pose_list.append((self.pose_head[i](input3, train),
                              self.pose_auxnet[i](input1, train)))
            par_list.append((self.par_head[i](input4, train),
                             self.edge_head[i](input2, train)))
        return pose_list, par_list


ARCH_PARAM_NAMES = ("alphas1", "alphas2", "alphas3", "alphas4",
                    "alphas_pose", "alphas_par", "betas1", "betas2",
                    "betas3", "betas4", "betas_pose", "betas_par")


def build_search_model(cfg, merged_streams: bool = False) -> SearchNet:
    """Construct the supernet from a Config (search_lip_sync.py:267).

    ``merged_streams=True`` runs encoder cell pairs as vmapped stream
    pairs — measured fastest bi-level step and smallest cold compile
    (BENCH.md round-5 search table); its checkpoints stack the stem/cell
    subtrees (convert with models/augment.unmerge_stream_variables)."""
    import jax.numpy as jnp

    return SearchNet(
        num_classes=cfg.dataset.num_classes,
        num_joints=cfg.dataset.num_joints,
        layers=cfg.search.layers,
        init_channels=cfg.search.init_channels,
        refine_layers=cfg.model.refine_layers,
        merged_streams=merged_streams,
        dtype=jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
        else jnp.float32,
    )


class SearchUpsampleCell(nn.Module):
    """Searchable decoder upsample cell (reference ``Upsample1``,
    model_search_interact.py:124-160): like the fixed UpsampleCell but
    every edge is a MixedOp; edges reading state 0 (the coarser feature)
    carry a 2x upscale. Defined for API parity — the released search keeps
    the decoder fixed (only interactions are searched, README.md:12)."""

    c_prev: int
    steps: int = 4
    multiplier: int = 4
    dtype: Any = None

    def setup(self):
        from npp_tpu.ops.primitives import ReLUConvBN

        c, d = self.c_prev // 4, self.dtype
        self.preprocess0 = ReLUConvBN(c, 1, 1, 0, True, d)
        self.preprocess1 = ReLUConvBN(c, 1, 1, 0, True, d)
        ops = []
        for i in range(self.steps):
            for j in range(2 + i):
                up = 2.0 if j == 0 else None
                ops.append(MixedOp(c, up, dtype=d))
        self.ops = ops

    def __call__(self, s0, s1, alpha_w, beta_w, train: bool):
        s0 = self.preprocess0(s0, train)
        s1 = self.preprocess1(s1, train)
        states = [s0, s1]
        offset = 0
        for i in range(self.steps):
            s = None
            for j, h in enumerate(states):
                term = beta_w[offset + j] * self.ops[offset + j](
                    h, alpha_w[offset + j], train)
                s = term if s is None else s + term
            offset += len(states)
            states.append(s)
        return jnp.concatenate(states[-self.multiplier:], axis=-1)
