"""Multi-scale sliding-window inference for parsing.

TPU-native re-design of reference ``BaseDataset.multi_scale_inference``
(dataset/base_dataset.py:182-244): the reference loops tiles one-by-one
through the model; here the ENTIRE pipeline — per-scale resize, tile
extraction, one batched forward over ALL scales' tiles (flip-TTA tiles
concatenated into the same batch, the batch padded to a multiple of 8 for
MXU tile packing), overlap-add with precomputed count masks, and the
cross-scale exp-logit accumulation (base_dataset.py:161-180, 241-244) —
is ONE jitted program per image geometry. Round 2 ran the glue eagerly
(one tunnel dispatch per tile slice/scatter and one shape-specialized
forward per scale); fusing it into a single program removed ~100 host
round-trips per image.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from npp_tpu.ops.resize import resize_bilinear


def _tile_origins(length: int, crop: int, stride: int) -> list[int]:
    """Window origins at stride steps, reference clip-tail semantics:
    the last window starts at ``(rows-1)*stride`` and is CLIPPED at the
    image edge (base_dataset.py:219-231 ``h1 = min(h0 + crop, new_h)``),
    not shifted back to fit. The clipped remainder is padded with the
    pad pixel for the forward and excluded from the accumulation (the
    program realizes this by extending the canvas to ``origin + crop``
    and cropping the valid region afterwards)."""
    if length <= crop:
        return [0]
    n = int(np.ceil((length - crop) / stride)) + 1
    return [i * stride for i in range(n)]


@functools.lru_cache(maxsize=32)
def _build_ms_program(apply_fn, takes_params: bool, oh: int, ow: int,
                      num_classes: int, ch: int, cw: int, scales: tuple,
                      flip: bool, pad_value_key, mesh=None,
                      base_size: int | None = None):
    """Compile one program covering every scale of an (oh, ow) image.

    ``apply_fn`` must be hashable (plain functions and jitted callables
    are); the cache holds a strong reference so ``id`` reuse is safe.
    With ``mesh``, the in-program tile batch is sharded over the mesh's
    ``data`` axis — all scales' tile forwards spread across chips in the
    same single program (multi-chip multi-scale eval).
    """
    stride_h = int(ch * 2.0 / 3.0)
    stride_w = int(cw * 2.0 / 3.0)
    geo = []
    total = 0
    for scale in scales:
        long_size = int((base_size or max(oh, ow)) * scale + 0.5)
        if oh > ow:
            nh, nw = long_size, int(ow * long_size / oh + 0.5)
        else:
            nh, nw = int(oh * long_size / ow + 0.5), long_size
        sh, sw = max(nh, ch), max(nw, cw)
        ys = _tile_origins(sh, ch, stride_h)
        xs = _tile_origins(sw, cw, stride_w)
        # Extended canvas: clipped tail windows run past the (padded)
        # image edge; accumulating full windows into the extension and
        # cropping to [:nh, :nw] afterwards reproduces the reference's
        # valid-region-only adds (base_dataset.py:229-231) exactly.
        eh, ew = ys[-1] + ch, xs[-1] + cw
        count = np.zeros((eh, ew, 1), np.float32)
        for y in ys:
            for x in xs:
                count[y:y + ch, x:x + cw] += 1.0
        geo.append((nh, nw, eh, ew, ys, xs, 1.0 / count))
        total += len(ys) * len(xs)

    n_fwd = 2 * total if flip else total
    mult = 8
    if mesh is not None:
        import math
        mult = math.lcm(8, int(mesh.shape["data"]))
    padded = -(-n_fwd // mult) * mult
    pad_pixel = (None if pad_value_key is None
                 else jnp.asarray(pad_value_key, jnp.float32))

    def run(params, image):
        tiles_all = []
        for nh, nw, eh, ew, ys, xs, _ in geo:
            scaled = resize_bilinear(image, (nh, nw), align_corners=False)
            ph, pw = eh - nh, ew - nw
            if ph or pw:
                scaled = jnp.pad(scaled,
                                 ((0, 0), (0, ph), (0, pw), (0, 0)),
                                 constant_values=0.0)
                if pad_pixel is not None:
                    mask = jnp.pad(jnp.ones((1, nh, nw, 1), jnp.float32),
                                   ((0, 0), (0, ph), (0, pw), (0, 0)))
                    scaled = scaled * mask + (1 - mask) * pad_pixel
            tiles_all.extend(scaled[0, y:y + ch, x:x + cw, :]
                             for y in ys for x in xs)
        tiles = jnp.stack(tiles_all)
        if flip:
            tiles = jnp.concatenate([tiles, tiles[:, :, ::-1, :]])
        if padded != n_fwd:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((padded - n_fwd,) + tiles.shape[1:],
                                  tiles.dtype)])
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            tiles = jax.lax.with_sharding_constraint(
                tiles, NamedSharding(mesh, PartitionSpec("data")))
        logits = (apply_fn(params, tiles) if takes_params
                  else apply_fn(tiles))
        logits = logits[:n_fwd].astype(jnp.float32)
        if flip:
            logits = 0.5 * (logits[:total]
                            + logits[total:, :, ::-1, :])
        # Reference accumulates pred.exp() per window
        # (base_dataset.py:180).
        probs = jnp.exp(logits)
        final = jnp.zeros((1, oh, ow, num_classes), jnp.float32)
        k = 0
        for nh, nw, eh, ew, ys, xs, inv_count in geo:
            preds = jnp.zeros((eh, ew, num_classes), jnp.float32)
            for y in ys:
                for x in xs:
                    preds = preds.at[y:y + ch, x:x + cw].add(probs[k])
                    k += 1
            preds = (preds * jnp.asarray(inv_count))[None, :nh, :nw, :]
            final = final + resize_bilinear(preds, (oh, ow),
                                            align_corners=False)
        return final

    return jax.jit(run)


def multi_scale_inference(apply_fn, image: np.ndarray, *, num_classes: int,
                          params=None, crop_size=(384, 384),
                          scales=(0.5, 0.75, 1.0, 1.25, 1.5),
                          flip: bool = True,
                          pad_value: np.ndarray | float = 0.0,
                          mesh=None, base_size: int | None = None
                          ) -> np.ndarray:
    """``image``: (1, H, W, 3) normalized. Returns (1, H, W, C) summed
    exp-logits across scales (base_dataset.py:241-244 semantics,
    including the clipped tail windows of the reference's sliding grid —
    oracle-tested against ``BaseDataset.multi_scale_inference`` in
    tests/test_reference_parity_eval.py).

    ``base_size``: the long-side size that ``scales`` multiply
    (base_dataset.py:118 ``self.base_size``); default None uses the
    image's own long side (scale 1.0 == native resolution).

    ``apply_fn(tiles) -> logits`` at tile resolution — or, when ``params``
    is given, ``apply_fn(params, tiles)``. PASS MODEL WEIGHTS VIA
    ``params``: the whole pipeline is jitted, and weights closed over by
    ``apply_fn`` would be inlined as program constants (the remote compile
    relay rejects >~100MB bodies).

    The compiled program is cached per (apply_fn, geometry); scalar
    ``pad_value`` pads tiles with 0.0 exactly like the reference's
    zero-padded windows, an array pad_value fills the padding with that
    pixel. ``mesh`` (with a ``"data"`` axis) shards the in-program tile
    batch across chips — multi-chip multi-scale eval in one SPMD program
    (tile count pads to lcm(8, n_data)).
    """
    _, oh, ow, _ = image.shape
    ch, cw = crop_size
    pv_key = (None if np.isscalar(pad_value)
              else tuple(np.asarray(pad_value, np.float32).ravel()
                         .tolist()))
    run = _build_ms_program(apply_fn, params is not None, oh, ow,
                            num_classes, ch, cw, tuple(scales), bool(flip),
                            pv_key, mesh, base_size)
    if mesh is not None and params is not None:
        # Checkpoint-restored arrays arrive COMMITTED to one device
        # (orbax SingleDeviceSharding); the program's tile-batch
        # sharding constraint spans the mesh, and jit refuses committed
        # args on incompatible devices. Replicate explicitly (same fix
        # as Predictor(mesh=...)).
        from jax.sharding import NamedSharding, PartitionSpec

        params = jax.device_put(params, NamedSharding(mesh,
                                                      PartitionSpec()))
    return np.asarray(run(params, jnp.asarray(image)))
