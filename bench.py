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
    images = [
        jax.random.normal(jax.random.PRNGKey(100 + i),
                          (batch, 384, 384, 3), jnp.float32)
        for i in range(8)
    ]

    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), images[0][:1], train=False)
    variables = jax.device_put(variables)

    def one(v, x):
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
    t0 = time.perf_counter()
    float(chain(variables, image))
    dt = (time.perf_counter() - t0) / n_iters
    img_per_sec = batch / dt

    # Single-image device latency via the same in-jit chain at batch 1
    # (a synchronous per-call measurement would include the dev tunnel's
    # ~30ms RTT, which doesn't exist in production serving).
    lat_image = images[0][:1]
    float(chain(variables, lat_image))
    t0 = time.perf_counter()
    float(chain(variables, lat_image))
    p50_ms = (time.perf_counter() - t0) / n_iters * 1000

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
