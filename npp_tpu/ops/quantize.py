"""Trace-time opt-in int8 quantization for dense convolutions (serving).

TPU-native feature with no reference analog (the reference serves fp32,
eval_util.py / function.py validate paths): the v5e MXU runs int8 x int8
-> int32 at 2x its bf16 FLOP rate, and int8 activations/weights move 2x
fewer HBM bytes. The mode quantizes every DENSE conv (groups == 1 — the
MXU-bound ops; depthwise convs stay in floating point, they are VPU/
bandwidth-bound and int8 would only add requant traffic):

- weights: symmetric per-output-channel int8 (scale = max|w| / 127 over
  the in/spatial axes). v1 computed this from the fp32 params INSIDE the
  graph every forward; v2 pre-quantizes the weight tree ONCE into a
  ``qconst`` flax collection (``prepare_weights``) — checkpoints are
  unchanged and no calibration pass is needed;
- activations: symmetric per-tensor int8. Default is DYNAMIC (scale =
  max|x| / 127, one serializing reduction per conv input — measured to
  be the dominant int8-v1 cost: ~3 extra HBM passes per conv). With a
  calibrated ``act_scales`` collection (``calibrate_acts``) the scale is
  STATIC and the requant fuses into the producing op's epilogue;
- accumulation in int32, dequantized as one fused f32 multiply by
  (act_scale * per_channel_weight_scale).

SERVING ONLY: gradients through round() are zero almost everywhere, so
never enable while differentiating.

Usage mirrors ``pooling.shift_pools``: the flag is read at TRACE time —

    with quantize.quantized_convs("int8"):
        out = jax.jit(model.apply)(variables, x, train=False)

v2 serving (prepared weights + calibrated static activation scales):

    qconst = quantize.prepare_weights(model, variables, tiny_x,
                                      train=False)
    scales = quantize.calibrate_acts(model, variables, calib_batches,
                                     train=False)
    with quantize.quantized_convs("int8"):
        out = jax.jit(model.apply, static_argnames=("train",))(
            {**variables, "qconst": qconst, "act_scales": scales},
            x, train=False)

or pass ``Predictor(..., quantize="int8")`` (prepares weights
automatically; ``Predictor.calibrate_int8(images)`` opts into static
activation scales).
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


def quantize_weight(kernel):
    """Symmetric per-output-channel int8 weight quantization.

    ``kernel``: fp HWIO. Returns ``(q_w int8, w_scale f32 (Cout,))``
    with ``q_w * w_scale ~= kernel``.
    """
    kf = kernel.astype(jnp.float32)
    w_scale = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                          1e-8) / 127.0                       # (Cout,)
    q_w = jnp.round(kf / w_scale).astype(jnp.int8)
    return q_w, w_scale


def int8_conv(x, kernel, bias, *, stride, padding, dilation, out_dtype,
              prepared=None, act_scale=None):
    """Dense NHWC conv as int8 x int8 -> int32.

    ``kernel``: fp32 HWIO (ignored when ``prepared`` carries the
    pre-quantized ``(q_w, w_scale)``). ``act_scale``: static per-tensor
    activation scale (f32 scalar) from calibration; None = dynamic
    (in-graph max reduction). Returns ``out_dtype`` activations.
    """
    if prepared is not None:
        q_w, w_scale = prepared
    else:
        q_w, w_scale = quantize_weight(kernel)

    xf = x.astype(jnp.float32)
    if act_scale is None:
        a_scale = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-8) / 127.0
        q_x = jnp.round(xf / a_scale).astype(jnp.int8)
    else:
        a_scale = act_scale
        # Static scales come from finite calibration data: clip, since
        # live activations may exceed the calibrated absmax.
        q_x = jnp.clip(jnp.round(xf / a_scale), -127.0,
                       127.0).astype(jnp.int8)

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


def prepare_weights(model, variables, sample_input, **apply_kwargs):
    """Pre-quantize every dense-conv kernel ONCE (int8 v2).

    Runs one forward at ``sample_input`` (use a tiny spatial size — the
    collected tree is shape-independent) with the ``qconst`` collection
    mutable; each dense conv sows its ``(q_w, w_scale)``. Returns the
    ``qconst`` tree to merge into the serving variables. Param tree and
    checkpoints stay unchanged.
    """
    @jax.jit
    def _prep(v, x):
        with quantized_convs("int8"):
            _, muts = model.apply(v, x, mutable=["qconst"],
                                  **apply_kwargs)
        return muts["qconst"]

    return _prep(variables, sample_input)


def calibrate_acts(model, variables, batches, **apply_kwargs):
    """Calibrate static per-tensor activation scales (int8 v2).

    Runs the int8 forward over ``batches`` (an iterable of model inputs)
    with the ``act_stats`` collection mutable, accumulating each dense
    conv input's running absmax, then converts to ``act_scales``
    (absmax / 127). Returns the ``act_scales`` tree to merge into the
    serving variables.
    """
    @jax.jit
    def _step(v, x):
        with quantized_convs("int8"):
            _, muts = model.apply(v, x, mutable=["act_stats"],
                                  **apply_kwargs)
        return muts["act_stats"]

    stats = None
    for x in batches:
        v = dict(variables)
        if stats is not None:
            v["act_stats"] = stats
        stats = _step(v, x)
    if stats is None:
        raise ValueError("calibrate_acts needs at least one batch")

    def to_scales(tree):
        out = {}
        for k, sub in tree.items():
            if k == "absmax":
                out["scale"] = jnp.maximum(sub, 1e-8) / 127.0
            else:
                out[k] = to_scales(sub)
        return out

    return to_scales(jax.tree.map(lambda a: a, stats))
