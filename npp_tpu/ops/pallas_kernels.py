"""Pallas TPU kernels for input-pipeline hot ops.

The reference renders Gaussian pose heatmaps with per-pixel Python loops in
DataLoader workers (target_generation.py:145-168). npp_tpu's default is the
fused XLA version (npp_tpu/data/targets.py:gen_pose_target_device); this
module provides a hand-written Pallas equivalent that keeps each
(J+1, H, W) tile resident in VMEM and renders main + aux (2*sigma) maps in
one pass — one kernel launch per batch element, no HBM intermediates.

``render_heatmaps_pallas`` is numerically identical to the XLA path (same
truncation at exponent 4.6052, same background channel).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TRUNC = 4.6052


def _render_kernel(joints_ref, vis_ref, main_ref, aux_ref, *, stride: int,
                   grid_y: int, grid_x: int, sigma: float, num_joints: int):
    start = stride / 2.0 - 0.5
    # TPU iota must be integer-typed; cast after.
    ys = (start + jax.lax.broadcasted_iota(
        jnp.int32, (grid_y, grid_x), 0).astype(jnp.float32) * stride)
    xs = (start + jax.lax.broadcasted_iota(
        jnp.int32, (grid_y, grid_x), 1).astype(jnp.float32) * stride)

    def render(sig, out_ref):
        bg = jnp.zeros((grid_y, grid_x), jnp.float32)
        inv = 1.0 / (2.0 * sig * sig)
        for j in range(num_joints):
            cx = joints_ref[0, j, 0]
            cy = joints_ref[0, j, 1]
            v = vis_ref[0, j, 0]
            d2 = (xs - cx) ** 2 + (ys - cy) ** 2
            expo = d2 * inv
            m = jnp.where(expo > _TRUNC, 0.0, jnp.exp(-expo)) * v
            out_ref[0, j, :, :] = m
            bg = jnp.maximum(bg, m)
        out_ref[0, num_joints, :, :] = 1.0 - bg

    render(float(sigma), main_ref)
    render(2.0 * float(sigma), aux_ref)


@functools.partial(jax.jit, static_argnames=("stride", "grid_x", "grid_y",
                                             "sigma"))
def render_heatmaps_pallas(joints: jnp.ndarray, visibility: jnp.ndarray,
                           *, stride: int = 4, grid_x: int = 96,
                           grid_y: int = 96, sigma: float = 3.0):
    """(B, J, 2) joints + (B, J) visibility -> NHWC (B, gy, gx, J+1) main
    and aux heatmaps, rendered channel-contiguous in VMEM then transposed.

    Bench note (v5e, chained-fetch methodology): at B=32, J=16, 96x96 this
    is comparable to the fused XLA renderer — XLA already emits one fused
    kernel for the broadcasted-exp formulation — so the XLA path stays the
    loader default; this kernel is the VMEM-resident alternative and the
    template for fusing more target work into a single pass.
    """
    b, j, _ = joints.shape
    kernel = functools.partial(_render_kernel, stride=stride, grid_y=grid_y,
                               grid_x=grid_x, sigma=sigma, num_joints=j)
    out_shape = jax.ShapeDtypeStruct((b, j + 1, grid_y, grid_x), jnp.float32)
    vis2 = visibility[..., None].astype(jnp.float32)
    main, aux = pl.pallas_call(
        kernel,
        grid=(b,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((1, j, 2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, j + 1, grid_y, grid_x),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, j + 1, grid_y, grid_x),
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
    )(joints.astype(jnp.float32), vis2)
    return (jnp.transpose(main, (0, 2, 3, 1)),
            jnp.transpose(aux, (0, 2, 3, 1)))
