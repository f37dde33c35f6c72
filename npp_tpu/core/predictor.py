"""Standalone inference API: one image in, parsing + keypoints out.

Working replacement for the reference's bit-rotted ``utils/eval_util.py``
(single/multi-image multi-scale + flip TTA testing; imports a nonexistent
module, SURVEY.md §8): wraps preprocessing (long-side scale + center crop,
data_loader.py eval path), the jitted TTA forward, on-device decode, and
inverse mapping to original image coordinates.
"""
from __future__ import annotations

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from npp_tpu.core.inference import (FLIPPED_POSEIDX, FLIPPED_POSEIDX_PPP,
                                    decode_pose_fused, decode_pose_validate,
                                    flip_parsing_fuse, fuse_multiscale_pose)
from npp_tpu.ops.resize import resize_bilinear


class Predictor:
    """Joint parsing + pose predictor for raw RGB images."""

    def __init__(self, model, variables, *, crop_size=(384, 384),
                 flip_test: bool = True,
                 flip_pairs=((14, 15), (16, 17), (18, 19)),
                 blur_sigma: float = 3.0, quantize: str | None = None,
                 fuse_necks: bool = False, fuse_cells: bool = False,
                 mesh=None, dark_decode: bool = False,
                 pose_scales: tuple = (1.0,)):
        """``quantize="int8"`` serves dense convs as int8 MXU ops
        (ops/quantize.py) — same fp checkpoint, opt-in accuracy/
        throughput trade. Weights are pre-quantized ONCE at construction
        (int8 v2 'qconst' collection); activation scales are dynamic
        until ``calibrate_int8(images)`` installs calibrated static
        ones. ``fuse_necks=True`` rewrites the model
        to the fused-neck layout (one conv+BN per stream instead of two;
        exact — see models/augment.fuse_neck_variables) and transforms
        ``variables`` to match; pass an unfused model/checkpoint.
        ``fuse_cells=True`` likewise rewrites same-input sibling edge
        groups in every cell into single K-wide ops
        (models/augment.fuse_sibling_variables; exact in fp — under
        int8 a group shares one requant scale). The fused families
        default to the measured-best serving set (std convs + SE;
        models/cells.DEFAULT_SIBLING_FAMILIES) — construct the model
        with ``sibling_families=ALL_SIBLING_FAMILIES`` to also merge
        dil/sep depthwise chains (exact but measured slightly slower
        at flagship widths).

        ``mesh``: a ``jax.sharding.Mesh`` with a ``"data"`` axis enables
        data-parallel multi-chip serving — weights replicated, request
        batches sharded over the axis, one SPMD program (no cross-chip
        activation traffic at serving shapes; SCALING.md §Serving). A
        2-D ``data x space`` mesh additionally shards image height
        (spatial partitioning — per-request latency; crop H and H/4
        must divide n_space). The device batch is padded to a multiple
        of lcm(8, n_data).

        ``dark_decode=True`` refines keypoints with DARK sub-pixel
        decode (``inference.post_process_dark``) — more accurate than
        the reference's quarter-offset; off by default for parity.

        ``pose_scales``: scale multipliers for scale-list pose TTA (the
        reference's standalone tester, utils/eval_util.py:82-268 — bit-
        rotted there, working here). Must contain 1.0. All scale crops
        (and their flips) run as ONE batched forward; per-scale heatmaps
        are flip-fused, resampled into base-canvas coordinates with a
        sub-pixel affine bilinear gather (inference.fuse_multiscale_pose
        — the TPU formulation of the reference's un-crop/resize/paste),
        averaged, then decoded as usual. Parsing output always comes
        from the 1.0 scale (multi-scale PARSING is core/multiscale.py's
        job). Composes with ``mesh``: the scale-crop stack is flattened
        batch-major to (B*S, ...) on the host so the data-axis sharding
        on dim 0 survives the in-jit (B, S) reshape; the fusion math is
        unchanged."""
        if fuse_necks and not getattr(model, "fused_necks", False):
            from npp_tpu.models.augment import fuse_neck_variables
            model = model.clone(fused_necks=True)
            variables = fuse_neck_variables(variables)
        if fuse_cells and not getattr(model, "fused_cells", False):
            # Same-input std-conv edges served as K-wide merged convs
            # (exact in fp; models/augment.fuse_sibling_variables).
            from npp_tpu.models.augment import fuse_sibling_variables
            variables = fuse_sibling_variables(variables, model)
            model = model.clone(fused_cells=True)
        if quantize == "int8":
            # int8 v2: hoist weight quantization out of the serving
            # graph. One jitted pass at a tiny spatial size (params are
            # H/W-independent) sows the int8 kernels + scales.
            from npp_tpu.ops.quantize import prepare_weights
            qconst = prepare_weights(
                model, variables,
                jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)
            variables = {**variables, "qconst": qconst}
        self.pose_scales = tuple(float(s) for s in pose_scales)
        if 1.0 not in self.pose_scales:
            raise ValueError("pose_scales must contain the base scale 1.0")
        self._base_si = self.pose_scales.index(1.0)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from npp_tpu.parallel.spatial import image_sharding
            self._n_data = int(mesh.shape["data"])
            n_space = int(dict(mesh.shape).get("space", 1))
            if n_space > 1:
                ch_ = crop_size[1]
                if ch_ % n_space or (ch_ // 4) % n_space:
                    raise ValueError(
                        f"crop height {ch_} (and {ch_}//4) must divide "
                        f"space={n_space} for spatial serving")
            self._batch_sharding = image_sharding(mesh)
            variables = jax.device_put(
                variables, NamedSharding(mesh, PartitionSpec()))
        else:
            self._n_data = 1
        self.model = model
        self.variables = variables
        self.crop_size = crop_size
        self.flip_test = flip_test
        self.flip_pairs = flip_pairs
        self.blur_sigma = blur_sigma
        self.quantize = quantize

        from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD
        from npp_tpu.ops.quantize import quantized_convs
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)

        def fwd(variables, image_u8):
            # uint8 upload (4x fewer host->device bytes per request);
            # ImageNet normalization runs fused on device. The quantize
            # context is trace-time only (jit caches the traced graph).
            image = (image_u8.astype(jnp.float32) / 255.0 - mean) / std
            with quantized_convs(quantize):
                pose_list, par_list = model.apply(variables, image,
                                                  train=False)
            return (pose_list[-1][0].astype(jnp.float32),
                    par_list[-1][0].astype(jnp.float32))

        def serve(variables, image_u8, crop_params, scales):
            # The WHOLE serving pipeline — direct + flipped forwards,
            # parsing upsample + flip fusion + argmax, pose decode — as
            # one program: one dispatch (and one launch-overhead /
            # tunnel-RTT) per batch instead of ~5.
            ch_, cw_ = self.crop_size[1], self.crop_size[0]
            pose_hm, par_logits = fwd(variables, image_u8)
            par = resize_bilinear(par_logits, (ch_, cw_),
                                  align_corners=False)
            fp_hm = None
            if self.flip_test:
                fp_hm, fp_par = fwd(variables, image_u8[:, :, ::-1, :])
                fpar = resize_bilinear(fp_par, (ch_, cw_),
                                       align_corners=False)
                par = flip_parsing_fuse(par, fpar, self.flip_pairs)
            n_j = pose_hm.shape[-1]
            fidx = (FLIPPED_POSEIDX if n_j == 16 else FLIPPED_POSEIDX_PPP
                    if n_j == 14 else tuple(range(n_j)))
            kp = decode_pose_validate(pose_hm, fp_hm, crop_params, scales,
                                      (ch_, cw_), self.blur_sigma, fidx,
                                      dark=dark_decode)
            return jnp.argmax(par, axis=-1).astype(jnp.uint8), kp

        def serve_ms(variables, flat_u8, crop_params, scales):
            # Scale-list pose TTA: flat_u8 (B*S, ch, cw, 3), the
            # batch-major host flatten of one crop per scale multiplier
            # (b-index major so a mesh data-axis sharding on dim 0
            # survives the (B, S) reshape below); crop_params
            # (S, B, 1, 8). Direct + flipped forwards over the flattened
            # batch, per-scale flip fusion, affine resample into
            # base-canvas coords, average, decode (reference
            # eval_util.py:82-268 protocol).
            ch_, cw_ = self.crop_size[1], self.crop_size[0]
            s = len(self.pose_scales)
            b = flat_u8.shape[0] // s
            pose_hm, par_logits = fwd(variables, flat_u8)
            n_j = pose_hm.shape[-1]
            fidx = (FLIPPED_POSEIDX if n_j == 16 else FLIPPED_POSEIDX_PPP
                    if n_j == 14 else tuple(range(n_j)))
            par_b = par_logits.reshape((b, s) + par_logits.shape[1:])[
                :, self._base_si]
            par = resize_bilinear(par_b, (ch_, cw_), align_corners=False)
            hm = resize_bilinear(pose_hm, (ch_, cw_), align_corners=False)
            if self.flip_test:
                fhm, fpar = fwd(variables, flat_u8[:, :, ::-1, :])
                fpar_b = fpar.reshape((b, s) + fpar.shape[1:])[
                    :, self._base_si]
                fpar_up = resize_bilinear(fpar_b, (ch_, cw_),
                                          align_corners=False)
                par = flip_parsing_fuse(par, fpar_up, self.flip_pairs)
                fl = fhm[..., jnp.asarray(fidx[:n_j])]
                fl = resize_bilinear(fl, (ch_, cw_), align_corners=False)
                hm = 0.5 * (hm + fl[:, :, ::-1, :])
            hm = hm.reshape((b, s, ch_, cw_, n_j)).transpose(1, 0, 2, 3, 4)
            ms = fuse_multiscale_pose(hm, crop_params, self.pose_scales,
                                      self._base_si)
            kp = decode_pose_fused(ms, crop_params[self._base_si], scales,
                                   blur_sigma=self.blur_sigma,
                                   dark=dark_decode)
            return jnp.argmax(par, axis=-1).astype(jnp.uint8), kp

        self._fwd = jax.jit(fwd)
        self._serve = jax.jit(
            serve if len(self.pose_scales) == 1 else serve_ms)

    def calibrate_int8(self, images, *, batch_size: int = 8):
        """Install calibrated STATIC int8 activation scales (int8 v2).

        Runs the int8 forward over ``images`` (raw RGB, preprocessed the
        same way as serving) recording each dense conv input's absmax;
        subsequent predictions quantize activations with the resulting
        static scales — the per-conv dynamic max reduction (the dominant
        int8-v1 cost) disappears from the serving graph. Calibrate on
        data representative of the serving distribution; live
        activations beyond the calibrated range are clipped."""
        if self.quantize != "int8":
            raise ValueError("calibrate_int8 requires quantize='int8'")
        if not images:
            raise ValueError("calibrate_int8 needs at least one image")
        from npp_tpu.data.lip import IMAGENET_MEAN, IMAGENET_STD
        from npp_tpu.ops.quantize import calibrate_acts
        pre = np.stack([self.preprocess(im)[0] for im in images])
        n = len(images)
        padded = -(-n // batch_size) * batch_size
        if padded != n:  # repeat-pad: keeps one compiled batch shape
            pre = np.concatenate(
                [pre, np.repeat(pre[-1:], padded - n, axis=0)])
        norm = (pre.astype(np.float32) / 255.0
                - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
        batches = [jnp.asarray(norm[i:i + batch_size])
                   for i in range(0, padded, batch_size)]
        scales = calibrate_acts(self.model, self.variables, batches,
                                train=False)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            scales = jax.device_put(
                scales, NamedSharding(self.mesh, PartitionSpec()))
        self.variables = {**self.variables, "act_scales": scales}

    def preprocess(self, im_rgb: np.ndarray, scale_mult: float = 1.0):
        """Eval-path geometry (data_loader.py:221-237): long-side scale to
        crop size, center crop, normalize. ``scale_mult`` multiplies the
        base scale (scale-list TTA crops, eval_util.py:106-112)."""
        cw, ch = self.crop_size
        scale = scale_mult * float(cw) / max(im_rgb.shape[0],
                                             im_rgb.shape[1])
        scaled = cv2.resize(im_rgb, None, fx=scale, fy=scale,
                            interpolation=cv2.INTER_CUBIC)
        h, w = scaled.shape[:2]
        canvas = np.zeros((ch, cw, 3), np.float32) + 128.0
        cy, cx = h / 2.0, w / 2.0
        off_sx, off_sy = int(cx - cw / 2.0), int(cy - ch / 2.0)
        crop_sx, crop_sy = max(off_sx, 0), max(off_sy, 0)
        store_sx, store_sy = max(-off_sx, 0), max(-off_sy, 0)
        crop_ex = min(int(cx + cw / 2.0), w - 1)
        crop_ey = min(int(cy + ch / 2.0), h - 1)
        store_ex = store_sx + (crop_ex - crop_sx)
        store_ey = store_sy + (crop_ey - crop_sy)
        canvas[store_sy:store_ey, store_sx:store_ex] = \
            scaled[crop_sy:crop_ey, crop_sx:crop_ex]
        crop_param = np.array([[crop_sx, crop_sy, store_sx, store_sy,
                                crop_ex, crop_ey, store_ex, store_ey]],
                              np.float32)
        return canvas.astype(np.uint8), crop_param, scale

    def __call__(self, im_rgb: np.ndarray) -> dict:
        """Returns {'parsing': (H, W) labels in original size,
        'keypoints': (J, 3) x,y,score in original coords,
        'parsing_crop': labels at crop size}."""
        return self.predict_batch([im_rgb])[0]

    def predict_batch(self, images, *, pad_to_multiple: int = 8) -> list:
        """Batched inference; returns one ``__call__``-style dict per image.

        The device batch is padded up to the next multiple of
        ``pad_to_multiple`` (a single image runs unpadded): on the v5e,
        batch dims that do not fill the 8-row register tile collapse ~3x
        (BENCH.md batch-size profile — bs12 runs at 165 img/s vs bs16's
        371, while padded bs4->8 matches the bs8 rate), and quantizing the
        shape set to {1, 8, 16, ...} bounds XLA recompiles to one program
        per tier. Pad rows replicate the last image and are discarded."""
        if not images:
            return []
        pre = [self.preprocess(im) for im in images]
        return self._predict_preprocessed(pre, images, pad_to_multiple)

    def _predict_preprocessed(self, pre, images, pad_to_multiple):
        canvases = np.stack([p[0] for p in pre])
        crop_params = np.stack([p[1] for p in pre])        # (B, 1, 8)
        scales = np.asarray([p[2] for p in pre], np.float32)
        n = len(images)
        if self._n_data > 1:
            import math
            pad_to_multiple = math.lcm(pad_to_multiple, self._n_data)
        padded = (n if n == 1 and self._n_data == 1
                  else -(-n // pad_to_multiple) * pad_to_multiple)
        if padded != n:
            reps = padded - n
            canvases = np.concatenate(
                [canvases, np.repeat(canvases[-1:], reps, axis=0)])
            crop_params = np.concatenate(
                [crop_params, np.repeat(crop_params[-1:], reps, axis=0)])
            scales = np.concatenate(
                [scales, np.repeat(scales[-1:], reps)])

        if len(self.pose_scales) > 1:
            return self._predict_multiscale(canvases, crop_params, scales,
                                            images, n, padded)
        if self.mesh is not None:
            # One host-side-sliced transfer straight to the mesh sharding
            # (jnp.asarray first would commit the full batch to one chip
            # and then re-scatter it).
            batch = jax.device_put(canvases, self._batch_sharding)
        else:
            batch = jnp.asarray(canvases)
        par_crops, kp = self._serve(self.variables, batch,
                                    jnp.asarray(crop_params),
                                    jnp.asarray(scales))
        par_crops = np.asarray(par_crops)
        kp = np.asarray(kp)

        return [self._postprocess(images[i], par_crops[i],
                                  crop_params[i], scales[i], kp[i])
                for i in range(n)]

    def _predict_multiscale(self, base_canvases, base_cp, scales,
                            images, n, padded):
        # Assemble the (S, B, ...) scale-crop stack; the base row reuses
        # the already-preprocessed (and padded) canvases.
        canv_rows, cp_rows = [], []
        for si, sm in enumerate(self.pose_scales):
            if si == self._base_si:
                canv_rows.append(base_canvases)
                cp_rows.append(base_cp)
                continue
            ps = [self.preprocess(im, scale_mult=sm) for im in images]
            cv = np.stack([p[0] for p in ps])
            cp = np.stack([p[1] for p in ps])
            if padded != n:
                reps = padded - n
                cv = np.concatenate([cv, np.repeat(cv[-1:], reps, axis=0)])
                cp = np.concatenate([cp, np.repeat(cp[-1:], reps, axis=0)])
            canv_rows.append(cv)
            cp_rows.append(cp)
        # Batch-major flatten (B, S) -> (B*S): a mesh data-axis sharding
        # on dim 0 then slices whole per-image scale groups, and the
        # in-jit reshape back to (B, S) keeps dim 0 sharded.
        stack = np.stack(canv_rows)                      # (S, B, ...)
        flat = np.ascontiguousarray(
            stack.transpose((1, 0) + tuple(range(2, stack.ndim)))
        ).reshape((-1,) + stack.shape[2:])
        if self.mesh is not None:
            flat = jax.device_put(flat, self._batch_sharding)
        else:
            flat = jnp.asarray(flat)
        par_crops, kp = self._serve(self.variables, flat,
                                    jnp.asarray(np.stack(cp_rows)),
                                    jnp.asarray(scales))
        par_crops = np.asarray(par_crops)
        kp = np.asarray(kp)
        return [self._postprocess(images[i], par_crops[i],
                                  base_cp[i], scales[i], kp[i])
                for i in range(n)]

    def predict_stream(self, images, *, batch_size: int = 8,
                       prefetch: int = 2):
        """Generator over ``__call__``-style dicts for an iterable of
        images. A worker thread runs the host-side cv2 preprocessing one
        batch ahead so it overlaps device compute (the serving analog of
        the training loader's prefetch). Results stream in input order;
        the tail batch follows predict_batch's padding rules."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=max(prefetch, 1))
        _END = object()

        def feed():
            # Any exception (unreadable image, bad iterator) is shipped to
            # the consumer instead of dying silently in this thread —
            # otherwise the generator would block on q.get() forever.
            try:
                chunk, pres = [], []
                for im in images:
                    chunk.append(im)
                    pres.append(self.preprocess(im))
                    if len(chunk) == batch_size:
                        q.put((pres, chunk))
                        chunk, pres = [], []
                if chunk:
                    q.put((pres, chunk))
                q.put(_END)
            except BaseException as e:  # noqa: BLE001 — re-raised below
                q.put(e)

        t = threading.Thread(target=feed, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                t.join()
                raise item
            pres, chunk = item
            yield from self._predict_preprocessed(pres, chunk, 8)
        t.join()

    def _postprocess(self, im_rgb, par_crop, crop_param, scale,
                     keypoints) -> dict:
        # Map the crop parsing back to original-size labels: undo the
        # center crop then resize with nearest interpolation.
        oh, ow = im_rgb.shape[:2]
        cp = crop_param[0].astype(int)
        sh = int(round(oh * scale))
        sw = int(round(ow * scale))
        full = np.zeros((sh, sw), np.uint8)
        full[cp[1]:cp[5], cp[0]:cp[4]] = par_crop[cp[3]:cp[7], cp[2]:cp[6]]
        parsing = cv2.resize(full, (ow, oh),
                             interpolation=cv2.INTER_NEAREST)
        return {"parsing": parsing, "keypoints": keypoints,
                "parsing_crop": par_crop}
