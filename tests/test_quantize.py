"""int8 dense-conv serving mode (ops/quantize.py).

No reference analog (the reference serves fp32); these tests pin the
quantization contract: bounded error vs the fp conv, an UNCHANGED param
tree (fp checkpoints serve quantized), and a sane full-model forward.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from npp_tpu.ops import quantize
from npp_tpu.ops.primitives import Conv, ReLUConvBN

# Slow tier: compile-heavy / subprocess / reference-scale (see pytest.ini).
pytestmark = pytest.mark.slow


def _fp_conv(x, kernel, bias, stride, padding, dilation):
    ph, pw = padding
    out = jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride, padding=((ph, ph), (pw, pw)),
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias if bias is not None else out


@pytest.mark.parametrize("stride,padding,dilation", [
    ((1, 1), (1, 1), (1, 1)),
    ((2, 2), (1, 1), (1, 1)),
    ((1, 1), (2, 2), (2, 2)),
])
def test_int8_conv_error_bounded(stride, padding, dilation):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 32, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.01, jnp.float32)
    ref = _fp_conv(x, w, b, stride, padding, dilation)
    q = quantize.int8_conv(x, w, b, stride=stride, padding=padding,
                           dilation=dilation, out_dtype=jnp.float32)
    assert q.shape == ref.shape
    # Per-element error is a sum of ~cin*k*k independent rounding errors
    # of magnitude <= (a_scale*|w| + w_scale*|x|)/2; empirically well
    # under 2% of the output range for gaussian data.
    scale = float(jnp.max(jnp.abs(ref)))
    err = float(jnp.max(jnp.abs(q - ref)))
    assert err < 0.02 * scale, (err, scale)


def test_int8_conv_zero_input_safe():
    x = jnp.zeros((1, 8, 8, 4), jnp.float32)
    w = jnp.zeros((3, 3, 4, 4), jnp.float32)
    q = quantize.int8_conv(x, w, None, stride=(1, 1), padding=(1, 1),
                           dilation=(1, 1), out_dtype=jnp.float32)
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_array_equal(np.asarray(q), 0.0)


def test_param_tree_identical_under_quantization():
    """Initializing under the int8 context must build the SAME variables
    tree as fp (path 'Conv_0'/kernel, shapes equal) — that is what lets
    fp checkpoints serve quantized."""
    x = jnp.zeros((1, 8, 8, 8), jnp.float32)
    mod = ReLUConvBN(16, 3, 1, 1, True, None)
    v_fp = mod.init(jax.random.PRNGKey(0), x, train=False)
    with quantize.quantized_convs("int8"):
        v_q = mod.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree_util.tree_structure(v_fp)
            == jax.tree_util.tree_structure(v_q))
    for a, b in zip(jax.tree.leaves(v_fp), jax.tree.leaves(v_q)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_depthwise_conv_stays_fp():
    """groups != 1 must take the fp path (depthwise is VPU-bound; int8
    would only add requant traffic) — outputs bit-identical in and out
    of the context."""
    x = jnp.asarray(np.random.default_rng(1).standard_normal((1, 8, 8, 8)),
                    jnp.float32)
    mod = Conv(8, (3, 3), (1, 1), (1, 1), groups=8, use_bias=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    ref = mod.apply(v, x)
    with quantize.quantized_convs("int8"):
        q = mod.apply(v, x)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(q))


def test_full_model_int8_forward_close(tiny_model_bundle):
    """Quantized full-model forward: same fp variables, outputs finite
    and close to the fp forward (the stacked-quant-noise envelope on the
    tiny untrained net)."""
    model, variables, x = tiny_model_bundle
    xr = jnp.asarray(
        np.random.default_rng(2).standard_normal(x.shape), jnp.float32)
    pose_fp, par_fp = model.apply(variables, xr, train=False)
    with quantize.quantized_convs("int8"):
        pose_q, par_q = model.apply(variables, xr, train=False)
    a = np.asarray(par_fp[-1][0], np.float32).ravel()
    b = np.asarray(par_q[-1][0], np.float32).ravel()
    assert np.isfinite(b).all()
    # Relative L2 and correlation: loose envelope for ~50 stacked
    # quantized convs on an untrained net.
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    corr = np.corrcoef(a, b)[0, 1]
    assert rel < 0.25, rel
    assert corr > 0.97, corr
    hp = np.asarray(pose_q[-1][0], np.float32)
    assert np.isfinite(hp).all()


def test_int8_composes_with_fused_necks(tiny_model_bundle):
    """int8 serving of a fused-neck checkpoint equals int8 serving of the
    unfused one: weight scales are per-output-channel (preserved by the
    channel concat) and the activation scale is per-tensor on the SAME
    neck input, so the int32 accumulations are identical integers."""
    from npp_tpu.models.augment import fuse_neck_variables

    model, variables, x = tiny_model_bundle
    xr = jnp.asarray(
        np.random.default_rng(3).standard_normal(x.shape), jnp.float32)
    fused_model = model.clone(fused_necks=True)
    fused_vars = fuse_neck_variables(variables)
    with quantize.quantized_convs("int8"):
        pose_a, par_a = jax.jit(model.apply, static_argnames=("train",))(
            variables, xr, train=False)
        pose_b, par_b = jax.jit(fused_model.apply,
                                static_argnames=("train",))(
            fused_vars, xr, train=False)
    np.testing.assert_allclose(np.asarray(par_b[-1][0]),
                               np.asarray(par_a[-1][0]),
                               rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pose_b[-1][0]),
                               np.asarray(pose_a[-1][0]),
                               rtol=0, atol=1e-4)


def test_prepared_weights_bitwise_equal_dynamic(tiny_model_bundle):
    """int8 v2 weight prep: serving with the pre-quantized 'qconst' tree
    must be BITWISE identical to v1's in-graph weight quantization (same
    math, hoisted out of the forward)."""
    model, variables, x = tiny_model_bundle
    xr = jnp.asarray(
        np.random.default_rng(4).standard_normal(x.shape), jnp.float32)
    qconst = quantize.prepare_weights(model, variables, x[:1], train=False)
    # The collection contains int8 kernels + f32 per-channel scales.
    leaves = jax.tree.leaves(qconst)
    assert any(a.dtype == jnp.int8 for a in leaves)
    with quantize.quantized_convs("int8"):
        pose_a, par_a = model.apply(variables, xr, train=False)
        pose_b, par_b = model.apply({**variables, "qconst": qconst}, xr,
                                    train=False)
    np.testing.assert_array_equal(np.asarray(par_a[-1][0]),
                                  np.asarray(par_b[-1][0]))
    np.testing.assert_array_equal(np.asarray(pose_a[-1][0]),
                                  np.asarray(pose_b[-1][0]))


def test_calibrated_static_scales_close(tiny_model_bundle):
    """int8 v2 static activation scales: calibrating on the serving batch
    itself must reproduce the dynamic-scale forward closely (first-conv
    scale is identical; downstream drifts only by requant noise)."""
    model, variables, x = tiny_model_bundle
    xr = jnp.asarray(
        np.random.default_rng(5).standard_normal(x.shape), jnp.float32)
    qconst = quantize.prepare_weights(model, variables, x[:1], train=False)
    scales = quantize.calibrate_acts(model, variables, [xr], train=False)
    assert all(a.ndim == 0 for a in jax.tree.leaves(scales))
    v_dyn = {**variables, "qconst": qconst}
    v_sta = {**v_dyn, "act_scales": scales}
    with quantize.quantized_convs("int8"):
        _, par_d = model.apply(v_dyn, xr, train=False)
        _, par_s = model.apply(v_sta, xr, train=False)
    a = np.asarray(par_d[-1][0], np.float32).ravel()
    b = np.asarray(par_s[-1][0], np.float32).ravel()
    assert np.isfinite(b).all()
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert rel < 0.05, rel


def test_calibration_accumulates_running_max(tiny_model_bundle):
    """Multi-batch calibration takes the max over batches: scales from
    [small, large] batches equal scales from [large] alone when 'large'
    dominates every conv input."""
    model, variables, x = tiny_model_bundle
    rng = np.random.default_rng(6)
    small = jnp.asarray(rng.standard_normal(x.shape) * 1e-3, jnp.float32)
    large = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    s_both = quantize.calibrate_acts(model, variables, [small, large],
                                     train=False)
    s_small = quantize.calibrate_acts(model, variables, [small],
                                      train=False)
    s_large = quantize.calibrate_acts(model, variables, [large],
                                      train=False)
    for ab, a, b in zip(jax.tree.leaves(s_both), jax.tree.leaves(s_small),
                        jax.tree.leaves(s_large)):
        np.testing.assert_array_equal(
            np.asarray(ab), np.maximum(np.asarray(a), np.asarray(b)))


def test_predictor_int8_v2_prepared_and_calibrated(tiny_model_bundle):
    """Predictor(quantize='int8') pre-quantizes weights at construction
    (qconst present), and calibrate_int8 installs static activation
    scales without breaking serving (outputs stay close to the dynamic
    ones on the calibration distribution)."""
    from npp_tpu.core.predictor import Predictor

    model, variables, _ = tiny_model_bundle
    pred = Predictor(model, variables, crop_size=(64, 64),
                     flip_pairs=((1, 2),), quantize="int8")
    assert "qconst" in pred.variables
    assert any(a.dtype == jnp.int8
               for a in jax.tree.leaves(pred.variables["qconst"]))
    rng = np.random.default_rng(21)
    ims = [rng.integers(0, 255, (100, 80, 3)).astype(np.uint8)
           for _ in range(3)]
    dyn = pred.predict_batch(ims)
    pred.calibrate_int8(ims)
    assert "act_scales" in pred.variables
    sta = pred.predict_batch(ims)
    for a, b in zip(dyn, sta):
        agree = np.mean(a["parsing"] == b["parsing"])
        assert agree > 0.95, agree
        assert np.isfinite(b["keypoints"]).all()


def test_quantized_convs_context_restores():
    assert quantize.conv_quant_mode() is None
    with quantize.quantized_convs("int8"):
        assert quantize.conv_quant_mode() == "int8"
        with quantize.quantized_convs(None):
            assert quantize.conv_quant_mode() is None
        assert quantize.conv_quant_mode() == "int8"
    assert quantize.conv_quant_mode() is None
    with pytest.raises(ValueError):
        with quantize.quantized_convs("int4"):
            pass
