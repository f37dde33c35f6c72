"""Benchmark: LIP 384x384 flagship-model inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (hard-won on the axon tunnel runtime):
- ``block_until_ready`` does NOT reliably wait for remote execution, and
  deleted output futures can be cancelled — wall-clocking a dispatch loop
  measures nothing. The only trustworthy timing is K forward passes chained
  by a data dependency INSIDE one jit, ended by fetching a scalar value.
- weights come from the real initializer.

Baseline context: the reference (GuHuangAI/NPP) publishes no numbers
(BASELINE.md). ``vs_baseline`` is computed against a documented estimate of
the reference's single-GPU end-to-end inference throughput for this model
at 384x384: ~20 img/s on a V100 (dual-stream 16-cell DARTS CNN at C=64,
fp32 cuDNN plus per-stage Python/loader overhead). The BASELINE.json
north-star is >=10x that per chip.
"""
import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_GPU_IMG_PER_SEC = 20.0


def bench_infer(quantize: str | None = None, fused_necks: bool = False,
                merged_streams: bool = False, fused_cells: bool = False,
                repeat: int = 1, quant_prep: str = "none",
                all_families: bool = False) -> None:
    from npp_tpu.models.augment import (NPPNet, fuse_neck_variables,
                                        fuse_sibling_variables,
                                        merge_stream_variables)
    from npp_tpu.ops.quantize import quantized_convs

    kw = {}
    if all_families:
        # infer_cellfused_all: extend sibling fusion to the dil/sep
        # depthwise families too (exact; measured arm for the family
        # default decision — see models/cells.DEFAULT_SIBLING_FAMILIES).
        from npp_tpu.models.cells import ALL_SIBLING_FAMILIES
        kw["sibling_families"] = ALL_SIBLING_FAMILIES
    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16,
                   **kw)

    batch = 8
    images = [
        jax.random.normal(jax.random.PRNGKey(100 + i),
                          (batch, 384, 384, 3), jnp.float32)
        for i in range(8)
    ]

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images[0][:1], train=False)
    if fused_necks:
        # Serve the same (unfused) checkpoint through the fused-neck
        # layout, as Predictor(fuse_necks=True) would.
        model = model.clone(fused_necks=True)
        variables = fuse_neck_variables(variables)
    if fused_cells:
        # Same-input sibling edges (std-conv/SE/dil/sep families) merged
        # into K-wide or blocked-grouped ops (exact;
        # fuse_sibling_variables), as Predictor(fuse_cells=True) would.
        variables = fuse_sibling_variables(variables, model)
        model = model.clone(fused_cells=True)
    if merged_streams:
        # Exact stream-merge transform (stacks stem/cell pairs on a
        # leading stream axis; composes with the fusions above).
        variables = merge_stream_variables(variables, model.layers)
        model = model.clone(merged_streams=True)
    if quantize == "int8" and quant_prep != "none":
        # int8 v2: pre-quantized weight tree ('qconst'), and for
        # quant_prep="static" calibrated static activation scales from
        # OTHER batches than the timed one (ops/quantize.py docstring).
        from npp_tpu.ops.quantize import calibrate_acts, prepare_weights
        qconst = prepare_weights(model, variables,
                                 images[0][:1, :64, :64], train=False)
        variables = {**variables, "qconst": qconst}
        if quant_prep == "static":
            scales = calibrate_acts(model, variables, images[1:4],
                                    train=False)
            variables = {**variables, "act_scales": scales}
    variables = jax.device_put(variables)

    def one(v, x):
        with quantized_convs(quantize):
            pose_list, par_list = model.apply(v, x, train=False)
        return (jnp.mean(pose_list[-1][0].astype(jnp.float32))
                + jnp.mean(par_list[-1][0].astype(jnp.float32)))

    n_iters = 16

    @jax.jit
    def chain(v, x):
        def body(i, acc):
            # acc*1e-20 creates a data dependency without changing values.
            return acc + one(v, x + acc * 1e-20)
        return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

    image = images[0]
    float(chain(variables, image))  # warmup compile + execute + fetch
    rates = []
    for _ in range(max(1, repeat)):
        t0 = time.perf_counter()
        float(chain(variables, image))
        rates.append(batch * n_iters / (time.perf_counter() - t0))
    img_per_sec = float(np.median(rates))

    # Single-image device latency via the same in-jit chain at batch 1
    # (a synchronous per-call measurement would include the dev tunnel's
    # ~30ms RTT, which doesn't exist in production serving).
    lat_image = images[0][:1]
    float(chain(variables, lat_image))
    lats = []
    for _ in range(max(1, repeat)):
        t0 = time.perf_counter()
        float(chain(variables, lat_image))
        lats.append((time.perf_counter() - t0) / n_iters * 1000)
    p50_ms = float(np.median(lats))

    tag = ("" if quantize is None else f"_{quantize}") + (
        "" if quant_prep == "none" else f"{quant_prep}") + (
        "_fusednecks" if fused_necks else "") + (
        "_merged" if merged_streams else "") + (
        "_cellfused" if fused_cells else "")
    metric = f"lip384_infer{tag}_images_per_sec_per_chip"
    result = {
        "metric": metric,
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_GPU_IMG_PER_SEC, 2),
        "extra": {"p50_single_image_ms": round(p50_ms, 2),
                  "batch": batch,
                  "vs_baseline_note": "denominator is the DOCUMENTED "
                  "ESTIMATE of 20 img/s single-GPU reference throughput "
                  "(BENCH.md), not a measured reference number",
                  "backend": jax.default_backend(),
                  **({"quantize": quantize} if quantize else {}),
                  **({"runs_img_per_sec": [round(r, 1) for r in rates],
                      "runs_p50_ms": [round(l, 2) for l in lats]}
                     if repeat > 1 else {})},
    }
    print(json.dumps(result))


def bench_eval(n_images: int = 128) -> None:
    """BASELINE.json config 2: mini-eval with flip-TTA + decode + metrics
    (synthetic stand-in for the LIP val mini-split)."""
    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.data import DataLoader, SyntheticDataset, make_target_renderer
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 384, 384, 3)), train=False)
    params = {"model": variables["params"],
              "criterion": T.init_criterion_params(2)}
    ds = SyntheticDataset(length=n_images, crop_size=(384, 384),
                          num_joints=16, num_classes=20, is_train=False,
                          device_normalize=True)
    loader = DataLoader(ds, 8, shuffle=False, num_workers=4,
                        renderer=make_target_renderer(
                            num_joints=16, normalize_images=True),
                        cache_on_device=True)
    epoch = E.make_eval_epoch(model, num_classes=20,
                              class_weights=LIP_CLASS_WEIGHTS,
                              flip_test=True)
    # Warmup: one full pass fills the device batch cache (eval geometry is
    # deterministic); first validate_scanned compiles the epoch program.
    for _ in loader:
        pass
    E.validate_scanned(epoch, params, variables["batch_stats"], loader,
                       num_classes=20, log_fn=lambda s: None)
    t0 = time.perf_counter()
    result = E.validate_scanned(epoch, params, variables["batch_stats"],
                                loader, num_classes=20,
                                log_fn=lambda s: None)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "lip384_eval_images_per_sec_flip_tta",
        "value": round(n_images / dt, 2), "unit": "img/s",
        "vs_baseline": round((n_images / dt) / 10.0, 2),
        "extra": {"n_images": n_images, "mean_iou": result["mean_iou"],
                  "methodology": "one-dispatch scanned epoch over "
                  "device-cached batches (validate_scanned)"},
    }))


def bench_predict(n_images: int = 64, batch: int = 8,
                  quantize: str | None = None) -> None:
    """Serving-surface bench: Predictor.predict_stream end-to-end — host
    cv2 preprocess (prefetch-threaded) + uint8 upload + the one-dispatch
    serve program (flip-TTA forwards + parsing fuse + pose decode) + crop
    inverse mapping, raw RGB in / labels + keypoints out. Wall-clock
    includes the dev tunnel's per-batch dispatch RTT, which production
    serving doesn't pay."""
    from npp_tpu.core.predictor import Predictor
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.device_put(variables)
    pred = Predictor(model, variables, quantize=quantize)

    rng = np.random.default_rng(0)
    ims = [rng.integers(0, 255, (480 + 16 * (i % 4), 360, 3)).astype(
        np.uint8) for i in range(n_images)]
    list(pred.predict_stream(iter(ims[:batch]), batch_size=batch))  # warm
    t0 = time.perf_counter()
    outs = list(pred.predict_stream(iter(ims), batch_size=batch))
    dt = time.perf_counter() - t0
    assert len(outs) == n_images
    print(json.dumps({
        "metric": ("lip384_predict_images_per_sec" if quantize is None
                   else f"lip384_predict_{quantize}_images_per_sec"),
        "value": round(n_images / dt, 2), "unit": "img/s",
        "vs_baseline": None,
        "extra": {"batch": batch, "n_images": n_images,
                  **({"quantize": quantize} if quantize else {}),
                  "note": "raw-RGB-to-results; includes host pre/post + "
                  "tunnel RTTs per dispatch"},
    }))


def bench_int8_envelope(train_steps: int = 160, batch: int = 8,
                        n_images: int = 64) -> None:
    """Serving-accuracy envelope of the int8 path: metric deltas between
    fp (bf16) and int8 forwards through the FULL eval protocol (flip-TTA,
    parsing fusion, decode, mIoU) on the SAME weights.

    Weights: the flagship net briefly trained on the synthetic val
    batches themselves (loss drops ~3x) so parsing argmax and heatmap
    peaks are confident — untrained logits are near-uniform and any
    perturbation flips argmax, which would report pure noise as the
    envelope. With real LIP data + a converted checkpoint, RUNBOOK.md §6
    is the production version of this measurement."""
    from npp_tpu.core import evaluate as E
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.data import DataLoader, SyntheticDataset, make_target_renderer
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    tx = T.make_train_optimizer(1e-3, lr_step=(1000,), lr_factor=0.1,
                                steps_per_epoch=1000)
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               num_stages=2)
    ds = SyntheticDataset(length=n_images, crop_size=(384, 384),
                          num_joints=16, num_classes=20, is_train=False,
                          device_normalize=True)
    loader = DataLoader(ds, batch, shuffle=False, num_workers=4,
                        renderer=make_target_renderer(
                            num_joints=16, normalize_images=True),
                        cache_on_device=True)
    batches = [{k: v for k, v in b.items() if k not in ("names", "index")}
               for b in loader]
    step = T.make_train_step(model, tx, class_weights=LIP_CLASS_WEIGHTS,
                             donate=False)
    first = last = None
    for i in range(train_steps):
        state, m = step(state, batches[i % len(batches)])
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])

    params = {"model": state.params["model"],
              "criterion": state.params["criterion"]}
    # int8 v2 static path: pre-quantized weights + activation scales
    # calibrated on the val images themselves (the realistic protocol).
    from npp_tpu.ops.quantize import calibrate_acts, prepare_weights
    variables = {"params": params["model"],
                 "batch_stats": state.batch_stats}
    qconst = prepare_weights(model, variables,
                             jnp.zeros((1, 64, 64, 3), jnp.float32),
                             train=False)
    scales = calibrate_acts(model, {**variables, "qconst": qconst},
                            [b["image"] for b in batches], train=False)
    static_params = {**params, "qconst": qconst, "act_scales": scales}
    results = {}
    for name, mode, p in (("fp", None, params), ("int8", "int8", params),
                          ("int8static", "int8", static_params)):
        es = E.make_eval_step(model, num_classes=20,
                              class_weights=LIP_CLASS_WEIGHTS,
                              flip_test=True, quantize=mode)
        results[name] = E.validate(
            es, p, state.batch_stats, loader, num_classes=20,
            log_fn=lambda s: None)
    fp, q, qs = results["fp"], results["int8"], results["int8static"]
    # Keypoint deltas in source-image pixels.
    dk = np.linalg.norm(fp["pose_preds"][..., :2] - q["pose_preds"][..., :2],
                        axis=-1)
    dks = np.linalg.norm(fp["pose_preds"][..., :2]
                         - qs["pose_preds"][..., :2], axis=-1)
    print(json.dumps({
        "metric": "int8_vs_fp_miou_delta_pt",
        "value": round(100 * (q["mean_iou"] - fp["mean_iou"]), 3),
        "unit": "mIoU points", "vs_baseline": None,
        "extra": {"fp_miou": round(100 * fp["mean_iou"], 3),
                  "int8_miou": round(100 * q["mean_iou"], 3),
                  "int8static_miou": round(100 * qs["mean_iou"], 3),
                  "int8static_miou_delta_pt":
                      round(100 * (qs["mean_iou"] - fp["mean_iou"]), 3),
                  "fp_pixel_acc": round(100 * fp["pixel_acc"], 3),
                  "int8_pixel_acc": round(100 * q["pixel_acc"], 3),
                  "int8static_pixel_acc": round(100 * qs["pixel_acc"], 3),
                  "kp_mean_px": round(float(dk.mean()), 3),
                  "kp_p95_px": round(float(np.percentile(dk, 95)), 3),
                  "kp_max_px": round(float(dk.max()), 3),
                  "kp_static_mean_px": round(float(dks.mean()), 3),
                  "kp_static_p95_px": round(float(np.percentile(dks, 95)),
                                            3),
                  "train_steps": train_steps,
                  "loss_first_last": [round(first, 3), round(last, 3)],
                  "n_images": n_images},
    }))


def bench_pipeline(batch: int = 32, n_batches: int = 8) -> None:
    """BASELINE.json config 4: train input pipeline (aug + target gen)."""
    from npp_tpu.data import (DataLoader, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.data import fast_aug

    renderer = make_target_renderer(num_joints=16, normalize_images=True)
    ds = SyntheticDataset(length=batch * n_batches, crop_size=(384, 384),
                          num_joints=16, num_classes=20,
                          device_normalize=True)
    loader = DataLoader(ds, batch, shuffle=True, num_workers=8,
                        renderer=renderer)
    for b in loader:  # warmup epoch (compiles renderer)
        np.asarray(b["pose"][0, 0, 0, 0])
        break
    t0 = time.perf_counter()
    n = 0
    for b in loader:
        np.asarray(b["pose"][0, 0, 0, 0])  # force completion
        n += batch
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "train_input_pipeline_images_per_sec",
        "value": round(n / dt, 2), "unit": "img/s",
        "vs_baseline": None,
        "extra": {"batch": batch, "native_aug": fast_aug.is_available()},
    }))


def bench_ppp_multiscale(n_images: int = 8) -> None:
    """BASELINE.json config 3: Pascal-Person-Part multi-scale sliding-
    window parsing inference (experiments/pascal, TEST.SCALE_LIST) — the
    reference's per-tile Python loop (base_dataset.py:182-244) becomes
    batched tile forwards per scale."""
    from npp_tpu.core.multiscale import multi_scale_inference
    from npp_tpu.models.augment import NPPNet
    from npp_tpu.ops.resize import resize_bilinear

    model = NPPNet(num_classes=7, num_joints=14, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    variables = jax.device_put(variables)

    def seg_logits(v, tiles):
        # Params as jit ARGUMENTS, not closure constants (the remote
        # compile relay rejects >~100MB inlined weights — HTTP 413);
        # multi_scale_inference jits the whole tile pipeline around this.
        _, par_list = model.apply(v, tiles, train=False)
        return resize_bilinear(par_list[-1][0].astype(jnp.float32),
                               (tiles.shape[1], tiles.shape[2]),
                               align_corners=False)

    rng = np.random.default_rng(0)
    image = rng.standard_normal((1, 512, 384, 3)).astype(np.float32)
    # Warmup: compiles the single whole-pipeline program.
    multi_scale_inference(seg_logits, image, params=variables,
                          num_classes=7,
                          scales=(0.5, 0.75, 1.0, 1.25, 1.5), flip=True)
    t0 = time.perf_counter()
    for _ in range(n_images):
        out = multi_scale_inference(seg_logits, image, params=variables,
                                    num_classes=7,
                                    scales=(0.5, 0.75, 1.0, 1.25, 1.5),
                                    flip=True)
        # Force completion: the tunnel runtime acks dispatches before
        # execution, so an unfetched loop measures dispatch time only
        # (rounds 2-4 numbers had this flaw — they compared consistently
        # against each other but under-measured absolute latency).
        float(out.sum())
    dt = (time.perf_counter() - t0) / n_images
    assert out.shape == (1, 512, 384, 7)
    print(json.dumps({
        "metric": "ppp_multiscale_seconds_per_image",
        "value": round(dt, 3), "unit": "s/img",
        "vs_baseline": None,
        "extra": {"scales": 5, "flip": True, "size": "512x384",
                  "images_per_sec": round(1 / dt, 2)},
    }))


def bench_train(batch: int = 16, n_iters: int = 4) -> None:
    """Augment-phase train step at the reference's production scale
    (bs 16, L=16, C=64, 384px — augment_lip_sync.py:207-213 and
    experiments/lip/384_384.yaml:73-87): fwd + dual-task loss + bwd + Adam.

    Same chained-in-jit methodology as bench_infer: K steps chained
    through the TrainState inside one jit, ended by a scalar fetch."""
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    tx = T.make_train_optimizer(1e-3, lr_step=(100,), lr_factor=0.1,
                                steps_per_epoch=1000)
    hw = 384
    # Param shapes are H/W-independent; init small to skip a second
    # full-scale compile.
    sample = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0), sample,
                               num_stages=2)
    rng = np.random.default_rng(0)
    h = hw // 4
    train_batch = {
        "image": jnp.asarray(rng.standard_normal((batch, hw, hw, 3)),
                             jnp.float32),
        "par": jnp.asarray(rng.integers(0, 20, (batch, hw, hw)), jnp.int32),
        "edge": jnp.asarray(rng.integers(0, 2, (batch, hw, hw)), jnp.int32),
        "pose": jnp.asarray(rng.random((batch, h, h, 16)), jnp.float32),
        "pose_aux": jnp.asarray(rng.random((batch, h, h, 16)), jnp.float32),
        "pose_weight": jnp.ones((batch, 16), jnp.float32),
    }
    body = T.make_train_step_body(model, tx,
                                  class_weights=LIP_CLASS_WEIGHTS)

    @jax.jit
    def chain(state, b):
        def f(s, _):
            s2, m = body(s, b)
            return s2, m["loss"]
        final, losses = jax.lax.scan(f, state, None, length=n_iters)
        return losses[-1]

    float(chain(state, train_batch))  # warmup compile + execute
    t0 = time.perf_counter()
    float(chain(state, train_batch))
    dt = (time.perf_counter() - t0) / n_iters
    print(json.dumps({
        "metric": "lip384_train_images_per_sec_per_chip",
        "value": round(batch / dt, 2), "unit": "img/s",
        "vs_baseline": None,
        "extra": {"batch": batch, "s_per_step": round(dt, 4),
                  "layers": 16, "init_channels": 64,
                  "backend": jax.default_backend()},
    }))


def bench_train_e2e(batch: int = 16, n_images: int = 96) -> None:
    """Composed end-to-end training throughput: the REAL epoch driver
    (engine.train_epoch) with the input pipeline in the loop — host-side
    synthetic-LIP augmentation, threaded loading, prefetch, device upload,
    on-device target rendering, jitted train step. The device-only number
    is ``--config train``; the pipeline-only number is ``--config
    pipeline``; this measures their composition (the loader prepares batch
    i+1 while step i executes — overlap via async dispatch + prefetch
    threads). The epoch is serialized end-to-end by the final loss fetch
    (state chains every step), so the timing is trustworthy on the axon
    tunnel."""
    from npp_tpu import engine
    from npp_tpu.core import train as T
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.data import (DataLoader, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)
    tx = T.make_train_optimizer(1e-3, lr_step=(100,), lr_factor=0.1,
                                steps_per_epoch=1000)
    state = T.init_train_state(model, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3), jnp.float32),
                               num_stages=2)
    step = T.make_train_step(model, tx, class_weights=LIP_CLASS_WEIGHTS,
                             donate=False)
    ds = SyntheticDataset(length=n_images, crop_size=(384, 384),
                          num_joints=16, num_classes=20, is_train=True,
                          device_normalize=True)
    loader = DataLoader(ds, batch, shuffle=True, num_workers=8,
                        renderer=make_target_renderer(
                            num_joints=16, normalize_images=True))
    # Warmup epoch: compiles the step and fills OS page caches.
    state, _, _ = engine.train_epoch(step, state, loader, epoch=0,
                                     print_freq=10_000)
    t0 = time.perf_counter()
    state, loss, _ = engine.train_epoch(step, state, loader, epoch=1,
                                        print_freq=10_000)
    dt = time.perf_counter() - t0
    n = (n_images // batch) * batch
    print(json.dumps({
        "metric": "lip384_train_e2e_images_per_sec",
        "value": round(n / dt, 2), "unit": "img/s",
        "vs_baseline": None,
        "extra": {"batch": batch, "steps": n // batch,
                  "loss": round(float(loss), 3),
                  "note": "loader+device composed; 1-core dev host is the "
                  "bound (see pipeline config)"},
    }))


def bench_search_e2e(n_images: int = 28) -> None:
    """Composed search-epoch throughput: engine.search_epoch with BOTH
    zipped loaders (train + mini) in the loop at the reference scale
    (L=16/C=32/bs7/384px). Device bi-level pair is ~2 s/step (--config
    search); the host pipeline renders ~40 ms/img, so feeding 2x7 images
    per 2 s step should NOT be loader-bound even on the 1-core host —
    this config verifies that composition."""
    from npp_tpu import engine
    from npp_tpu.core import search as S
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.data import (DataLoader, SyntheticDataset,
                              make_target_renderer)
    from npp_tpu.models.search import SearchNet

    model = SearchNet(num_classes=20, num_joints=16, layers=16,
                      init_channels=32, refine_layers=1, dtype=jnp.bfloat16)
    w_tx, a_tx = S.make_search_optimizers(w_lr=1e-3, alpha_lr=1e-3,
                                          lr_step=(70,), lr_factor=0.2,
                                          steps_per_epoch=100)
    b = 7
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0),
                                jnp.zeros((1, 64, 64, 3), jnp.float32), 2)
    weight_step, arch_step = S.make_search_steps(
        model, w_tx, a_tx, class_weights=LIP_CLASS_WEIGHTS)
    renderer = make_target_renderer(num_joints=16, normalize_images=True)
    ds1 = SyntheticDataset(length=n_images, crop_size=(384, 384),
                           num_joints=16, num_classes=20, is_train=True,
                           device_normalize=True)
    ds2 = SyntheticDataset(length=n_images, crop_size=(384, 384),
                           num_joints=16, num_classes=20, is_train=True,
                           seed=1, device_normalize=True)
    l1 = DataLoader(ds1, b, shuffle=True, num_workers=4, renderer=renderer)
    l2 = DataLoader(ds2, b, shuffle=True, num_workers=4, renderer=renderer,
                    seed=1)
    state, _, _ = engine.search_epoch(weight_step, arch_step, state, l1, l2,
                                      epoch=0, print_freq=10_000)
    t0 = time.perf_counter()
    state, loss, _ = engine.search_epoch(weight_step, arch_step, state, l1,
                                         l2, epoch=1, print_freq=10_000)
    dt = time.perf_counter() - t0
    steps = n_images // b
    print(json.dumps({
        "metric": "search_e2e_step_seconds",
        "value": round(dt / steps, 3), "unit": "s/step",
        "vs_baseline": None,
        "extra": {"batch": b, "steps": steps,
                  "images_per_sec": round(steps * b / dt, 2),
                  "loss": round(float(loss), 3)},
    }))


def bench_search_step(full_scale: bool = True,
                      vmap_injections: bool = True,
                      merged_streams: bool = False) -> None:
    """BASELINE.json config 5: supernet search step (fwd+bwd, weight+arch).

    Default: the REFERENCE search scale — layers=16, C=32, batch 7, 384px
    (experiments/lip/384_384.yaml:51-68). Compiling the bi-level gradient
    program at this scale needs the supernet's rematerialized cells +
    vmapped fusion groups and a small-resolution init (param shapes are
    H/W-independent); first compile is ~20-40 min on the dev relay,
    cached afterwards (``warmup_pair_s`` reports it — point
    JAX_COMPILATION_CACHE_DIR at an empty dir for a true cold compile).
    ``full_scale=False`` runs the round-1 proxy (layers=8, C=16, 192px)
    which preserves all four scales and every searchable site.
    ``vmap_injections=False`` measures the pre-round-4 unrolled
    injection layout (the ``search_novmap`` config) so the default-on
    graph rewrite has a published number on both axes.
    ``merged_streams=True`` (the ``search_merged`` config) runs the
    encoder cell pairs as vmapped stream pairs (models/search.py) —
    fewer/larger ops at the C=32 width where the fixed net measured the
    merged encoder fastest, and a smaller program to compile.
    """
    from npp_tpu.core import search as S
    from npp_tpu.core.criterion import LIP_CLASS_WEIGHTS
    from npp_tpu.models.search import SearchNet

    layers, c, hw = (16, 32, 384) if full_scale else (8, 16, 192)
    model = SearchNet(num_classes=20, num_joints=16, layers=layers,
                      init_channels=c, refine_layers=1,
                      vmap_injections=vmap_injections,
                      merged_streams=merged_streams, dtype=jnp.bfloat16)
    w_tx, a_tx = S.make_search_optimizers(w_lr=1e-3, alpha_lr=1e-3,
                                          lr_step=(70,), lr_factor=0.2,
                                          steps_per_epoch=100)
    b = 7  # reference search batch (experiments/lip/384_384.yaml)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)  # small init (H/W-free)
    state = S.init_search_state(model, w_tx, a_tx, jax.random.PRNGKey(0), x,
                                2)
    weight_step, arch_step = S.make_search_steps(
        model, w_tx, a_tx, class_weights=LIP_CLASS_WEIGHTS)
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, hw, hw, 3)),
                             jnp.float32),
        "par": jnp.asarray(rng.integers(0, 20, (b, hw, hw)), jnp.int32),
        "edge": jnp.asarray(rng.integers(0, 2, (b, hw, hw)), jnp.int32),
        "pose": jnp.asarray(rng.random((b, hw // 4, hw // 4, 16)),
                            jnp.float32),
        "pose_aux": jnp.asarray(rng.random((b, hw // 4, hw // 4, 16)),
                                jnp.float32),
        "pose_weight": jnp.ones((b, 16), jnp.float32),
    }
    t_warm = time.perf_counter()
    state, m = weight_step(state, batch)
    float(m["loss"])
    warmup_w_s = time.perf_counter() - t_warm
    state, m2 = arch_step(state, batch, jnp.float32(0.0))
    float(m2["loss"])  # force completion of the warmup pair
    warmup_s = time.perf_counter() - t_warm  # == compile time when the
    # persistent compilation cache is cold (point JAX_COMPILATION_CACHE_DIR
    # at an empty dir to measure a true cold compile); warmup_weight_s
    # vs the pair total also documents the shared weight/arch program
    # claim (the arch step should add ~no compile time)
    t0 = time.perf_counter()
    n = 4
    for _ in range(n):
        state, m = weight_step(state, batch)
        state, m2 = arch_step(state, batch, jnp.float32(0.0))
        float(m2["loss"])  # value fetch serializes each bi-level pair
    dt = (time.perf_counter() - t0) / n
    print(json.dumps({
        "metric": "search_bilevel_step_seconds",
        "value": round(dt, 4), "unit": "s/step",
        "vs_baseline": None,
        "extra": {"batch": b, "images_per_sec": round(b / dt, 2),
                  "layers": layers, "init_channels": c, "image": hw,
                  "full_scale": full_scale,
                  "vmap_injections": vmap_injections,
                  "merged_streams": merged_streams,
                  "warmup_pair_s": round(warmup_s, 1),
                  "warmup_weight_s": round(warmup_w_s, 1)},
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="infer",
                   choices=["infer", "infer_int8", "infer_int8prep",
                            "infer_int8static", "infer_fused",
                            "infer_merged", "infer_merged_cellfused",
                            "infer_cellfused", "infer_cellfused_necks",
                            "infer_cellfused_all",
                            "eval", "pipeline", "search", "search_novmap",
                            "search_merged",
                            "train", "ppp_ms", "train_e2e", "search_e2e",
                            "predict", "predict_int8", "int8_envelope"])
    p.add_argument("--repeat", type=int, default=1,
                   help="repeat the timed infer measurement N times and "
                        "report the median (variance in extra.runs_*; "
                        "infer-family configs only)")
    args = p.parse_args()
    rep = args.repeat
    {"infer": lambda: bench_infer(repeat=rep),
     "infer_int8": lambda: bench_infer(quantize="int8", repeat=rep),
     "infer_int8prep": lambda: bench_infer(quantize="int8", repeat=rep,
                                           quant_prep="prep"),
     "infer_int8static": lambda: bench_infer(quantize="int8", repeat=rep,
                                             quant_prep="static"),
     "infer_fused": lambda: bench_infer(fused_necks=True, repeat=rep),
     "infer_merged": lambda: bench_infer(merged_streams=True, repeat=rep),
     "infer_merged_cellfused": lambda: bench_infer(
         merged_streams=True, fused_cells=True, repeat=rep),
     "infer_cellfused": lambda: bench_infer(fused_cells=True, repeat=rep),
     "infer_cellfused_necks": lambda: bench_infer(
         fused_cells=True, fused_necks=True, repeat=rep),
     "infer_cellfused_all": lambda: bench_infer(
         fused_cells=True, fused_necks=True, all_families=True,
         repeat=rep),
     "eval": bench_eval, "pipeline": bench_pipeline,
     "search": bench_search_step,
     "search_novmap": lambda: bench_search_step(vmap_injections=False),
     "search_merged": lambda: bench_search_step(merged_streams=True),
     "train": bench_train,
     "ppp_ms": bench_ppp_multiscale, "train_e2e": bench_train_e2e,
     "search_e2e": bench_search_e2e, "predict": bench_predict,
     "predict_int8": lambda: bench_predict(quantize="int8"),
     "int8_envelope": bench_int8_envelope}[args.config]()


if __name__ == "__main__":
    main()
