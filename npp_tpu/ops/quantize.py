"""Trace-time opt-in int8 quantization for dense convolutions (serving).

TPU-native feature with no reference analog (the reference serves fp32,
eval_util.py / function.py validate paths): the v5e MXU runs int8 x int8
-> int32 at 2x its bf16 FLOP rate, and int8 activations/weights move 2x
fewer HBM bytes. The mode quantizes every DENSE conv (groups == 1 — the
MXU-bound ops; depthwise convs stay in floating point, they are VPU/
bandwidth-bound and int8 would only add requant traffic):

- weights: symmetric per-output-channel int8 (scale = max|w| / 127 over
  the in/spatial axes), computed from the fp32 params inside the graph —
  checkpoints are unchanged and no calibration pass is needed;
- activations: symmetric per-tensor DYNAMIC int8 (scale = max|x| / 127,
  one fused reduction per conv input);
- accumulation in int32, dequantized as one fused f32 multiply by
  (act_scale * per_channel_weight_scale).

SERVING ONLY: gradients through round() are zero almost everywhere, so
never enable while differentiating.

Usage mirrors ``pooling.shift_pools``: the flag is read at TRACE time —

    with quantize.quantized_convs("int8"):
        out = jax.jit(model.apply)(variables, x, train=False)

or pass ``Predictor(..., quantize="int8")``.
"""
from __future__ import annotations

from contextlib import contextmanager

import jax
import jax.numpy as jnp

_MODE: str | None = None


def conv_quant_mode() -> str | None:
    """The active conv quantization mode (None = full precision)."""
    return _MODE


@contextmanager
def quantized_convs(mode: str | None = "int8"):
    """Enable conv quantization for modules TRACED inside this context."""
    global _MODE
    if mode not in (None, "int8"):
        raise ValueError(f"unknown conv quant mode {mode!r}")
    prev, _MODE = _MODE, mode
    try:
        yield
    finally:
        _MODE = prev


def int8_conv(x, kernel, bias, *, stride, padding, dilation, out_dtype):
    """Dense NHWC conv as int8 x int8 -> int32 with dynamic requant.

    ``kernel``: fp32 HWIO. Returns ``out_dtype`` activations.
    """
    kf = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                          1e-8) / 127.0                       # (Cout,)
    q_w = jnp.round(kf / w_scale).astype(jnp.int8)

    xf = x.astype(jnp.float32)
    a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0  # scalar
    q_x = jnp.round(xf / a_scale).astype(jnp.int8)

    ph, pw = padding
    acc = jax.lax.conv_general_dilated(
        q_x, q_w,
        window_strides=stride,
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (a_scale * w_scale)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
