"""Benchmark: LIP 384x384 flagship-model inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline context: the reference (GuHuangAI/NPP) publishes no numbers
(BASELINE.md). ``vs_baseline`` is computed against a documented estimate of
the reference's single-GPU end-to-end inference throughput for this model
at 384x384: ~20 img/s on a V100 (dual-stream 16-cell DARTS CNN at C=64,
~90 GFLOPs/img in fp32 cuDNN plus per-stage Python/loader overhead). The
BASELINE.json north-star is >=10x that per chip.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

REFERENCE_GPU_IMG_PER_SEC = 20.0


def main() -> None:
    from npp_tpu.models.augment import NPPNet

    model = NPPNet(num_classes=20, num_joints=16, layers=16,
                   init_channels=64, refine_layers=1, dtype=jnp.bfloat16)

    batch = 8
    image = jnp.asarray(
        np.random.default_rng(0).standard_normal((batch, 384, 384, 3)),
        jnp.float32)

    shapes = jax.eval_shape(
        lambda rng, x: model.init(rng, x, train=False),
        jax.random.PRNGKey(0), image)
    # Random weights (values don't affect throughput; avoid degenerate
    # all-zero activations).
    key = jax.random.PRNGKey(1)
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    variables = jax.tree.unflatten(treedef, [
        (jax.random.normal(k, s.shape, s.dtype) * 0.05
         if jnp.issubdtype(s.dtype, jnp.floating)
         else jnp.zeros(s.shape, s.dtype))
        for k, s in zip(keys, leaves)])

    @jax.jit
    def fwd_fn(variables, image):
        pose_list, par_list = model.apply(variables, image, train=False)
        return pose_list[-1][0], par_list[-1][0]

    variables = jax.device_put(variables)
    fwd = lambda img: fwd_fn(variables, img)

    # Warmup / compile.
    out = fwd(image)
    jax.block_until_ready(out)

    # Timed runs.
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(image)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    img_per_sec = batch * n_iters / dt

    # p50 single-image latency.
    lat_image = image[:1]
    out = fwd(lat_image)
    jax.block_until_ready(out)
    lats = []
    for _ in range(20):
        t0 = time.perf_counter()
        out = fwd(lat_image)
        jax.block_until_ready(out)
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1000)

    result = {
        "metric": "lip384_infer_images_per_sec_per_chip",
        "value": round(img_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_sec / REFERENCE_GPU_IMG_PER_SEC, 2),
        "extra": {"p50_single_image_ms": round(p50_ms, 2),
                  "batch": batch,
                  "backend": jax.default_backend()},
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
