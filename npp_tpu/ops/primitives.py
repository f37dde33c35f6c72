"""The NAS primitive operation set as Flax modules (NHWC, TPU-first).

TPU-native re-expression of reference ``models/operations.py:9-253``: same 15
candidate ops and internal orderings (ReLU-Conv-BN etc.), but NHWC layout,
bfloat16-friendly compute with fp32 params, and XLA-fusable building blocks.
BatchNorm uses flax running statistics; under a sharded-batch ``jit`` the
batch-moment reductions are global, which reproduces the reference's SyncBN
(search_lip_sync.py:268) for free.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from npp_tpu.ops import pooling, quantize
from npp_tpu.ops.resize import resize_scale

BN_MOMENTUM = 0.1  # torch momentum; flax momentum = 1 - torch momentum


class BatchNorm(nn.Module):
    """BatchNorm2d equivalent (momentum 0.1, eps 1e-5, optional affine).

    Hand-rolled rather than ``flax.linen.BatchNorm`` for one torch-parity
    detail: torch updates ``running_var`` with the *unbiased* batch
    variance (factor n/(n-1)) while normalizing with the biased one
    (ATen batch_norm semantics; reference BNs are plain
    ``nn.BatchNorm2d``, models/operations.py:69-103). Flax uses the
    biased variance for both, which makes running-stat trajectories
    drift — caught by the train-trajectory oracle test
    (tests/test_reference_parity_train.py).

    Variable layout matches flax BatchNorm ('batch_stats'/{mean,var},
    params {scale,bias}) so checkpoints and the torch converter are
    unaffected. Moments are computed in fp32 regardless of compute
    dtype. Under a sharded-batch jit the moment reductions are global
    (SPMD), reproducing reference SyncBN (search_lip_sync.py:268).
    """

    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        ch = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((ch,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((ch,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            # One-pass algebraic moments. XLA fuses both reductions into
            # the producing conv's epilogue (multi-output "convert_reduce"
            # convolution fusions running near MXU peak — verified by
            # device trace; an explicit variadic lax.reduce measured
            # exactly equal).
            mean = jnp.mean(xf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = BN_MOMENTUM
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + 1e-5)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (ch,),
                               jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (ch,),
                              jnp.float32)
            inv = inv * scale
            shift = bias - mean * inv
        else:
            shift = -mean * inv
        y = x.astype(jnp.float32) * inv + shift
        return y.astype(self.dtype or x.dtype)


class Conv(nn.Module):
    """Conv2d equivalent with explicit torch-style padding.

    Under ``quantize.quantized_convs("int8")`` (trace-time opt-in,
    serving only) dense convs (groups == 1) run as int8 x int8 -> int32
    MXU ops with dynamic requant; the param tree ('Conv_0'/{kernel,bias})
    is IDENTICAL either way, so fp checkpoints serve quantized
    unchanged. Depthwise/grouped convs always stay floating point."""

    features: int
    kernel: tuple[int, int]
    stride: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    dilation: tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        ph, pw = self.padding
        if quantize.conv_quant_mode() == "int8" and self.groups == 1:
            return _Int8Conv(
                features=self.features, kernel=self.kernel,
                stride=self.stride, padding=self.padding,
                dilation=self.dilation, use_bias=self.use_bias,
                dtype=self.dtype, name="Conv_0")(x)
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel,
            strides=self.stride,
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=self.dilation,
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)


class _Int8Conv(nn.Module):
    """Dense conv in int8 (see Conv docstring). Param names/shapes/init
    mirror ``nn.Conv`` exactly ('kernel' HWIO fp32, 'bias')."""

    features: int
    kernel: tuple[int, int]
    stride: tuple[int, int]
    padding: tuple[int, int]
    dilation: tuple[int, int]
    use_bias: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        kernel = self.param("kernel", nn.initializers.xavier_normal(),
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        # int8 v2 (ops/quantize.py docstring): pre-quantized weights in
        # the 'qconst' collection (sown by prepare_weights, read on
        # every serve) and calibrated static activation scales in
        # 'act_scales' (built by calibrate_acts from 'act_stats').
        # (is_initializing guards keep init's variable tree IDENTICAL to
        # fp mode — the collections appear only via prepare_weights /
        # calibrate_acts apply passes.)
        prepared = None
        if (self.has_variable("qconst", "qkernel")
                or (self.is_mutable_collection("qconst")
                    and not self.is_initializing())):
            qk = self.variable("qconst", "qkernel",
                               lambda: quantize.quantize_weight(kernel)[0])
            ws = self.variable("qconst", "wscale",
                               lambda: quantize.quantize_weight(kernel)[1])
            prepared = (qk.value, ws.value)

        act_scale = None
        if (self.is_mutable_collection("act_stats")
                and not self.is_initializing()):
            stat = self.variable("act_stats", "absmax",
                                 lambda: jnp.zeros((), jnp.float32))
            stat.value = jnp.maximum(
                stat.value, jnp.max(jnp.abs(x.astype(jnp.float32))))
        elif self.has_variable("act_scales", "scale"):
            act_scale = self.get_variable("act_scales", "scale")

        return quantize.int8_conv(x, kernel, bias, stride=self.stride,
                                  padding=self.padding,
                                  dilation=self.dilation,
                                  out_dtype=self.dtype or x.dtype,
                                  prepared=prepared, act_scale=act_scale)


class Zero(nn.Module):
    """'none' op (operations.py:31-41)."""

    stride: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.stride == 1:
            return x * 0.0
        return x[:, :: self.stride, :: self.stride, :] * 0.0


class Identity(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = False):
        return x


class PoolBN(nn.Module):
    """AvgPool/MaxPool 3x3 + BN (operations.py:44-66)."""

    pool_type: str
    kernel: int
    stride: int
    padding: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        if self.pool_type == "max":
            out = pooling.max_pool(x, self.kernel, self.stride, self.padding)
        else:
            out = pooling.avg_pool(x, self.kernel, self.stride, self.padding,
                                   count_include_pad=False)
        return BatchNorm(self.affine, self.dtype)(out, train)


class ReLUConvBN(nn.Module):
    """ReLU - Conv - BN (operations.py:69-82)."""

    features: int
    kernel: int
    stride: int
    padding: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(x)
        x = Conv(self.features, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 use_bias=False, dtype=self.dtype)(x)
        return BatchNorm(self.affine, self.dtype)(x, train)


class DilConvS(nn.Module):
    """ReLU - depthwise (dilated) - pointwise - BN (operations.py:202-220)."""

    features: int
    kernel: int
    stride: int
    padding: int
    dilation: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        x = nn.relu(x)
        x = Conv(c_in, (self.kernel, self.kernel),
                 (self.stride, self.stride), (self.padding, self.padding),
                 dilation=(self.dilation, self.dilation), groups=c_in,
                 use_bias=False, dtype=self.dtype)(x)
        x = Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype)(x)
        return BatchNorm(self.affine, self.dtype)(x, train)


class SepConv(nn.Module):
    """Two stacked DilConvS with dilation 1 (operations.py:190-200)."""

    features: int
    kernel: int
    stride: int
    padding: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        x = DilConvS(c_in, self.kernel, self.stride, self.padding, 1,
                     self.affine, self.dtype)(x, train)
        x = DilConvS(self.features, self.kernel, 1, self.padding, 1,
                     self.affine, self.dtype)(x, train)
        return x


class SEBlock(nn.Module):
    """Squeeze-excitation 'se_connect' (operations.py:105-129)."""

    stride: int = 1
    affine: bool = True  # unused by the reference either; kept for parity
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        w = pooling.global_avg_pool(x)
        w = nn.relu(Conv(c_in // 2, (1, 1), dtype=self.dtype)(w))
        w = nn.sigmoid(Conv(c_in, (1, 1), dtype=self.dtype)(w))
        out = x * w
        if self.stride == 1:
            return out
        out = pooling.avg_pool(out, 2, 2, 0)
        return BatchNorm(True, self.dtype)(out, train)


class FactorizedReduce(nn.Module):
    """Stride-2 factorized pointwise reduce (operations.py:142-157)."""

    features: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.relu(x)
        a = Conv(self.features // 2, (1, 1), (2, 2), use_bias=False,
                 dtype=self.dtype)(x)
        b = Conv(self.features // 2, (1, 1), (2, 2), use_bias=False,
                 dtype=self.dtype)(x[:, 1:, 1:, :])
        out = jnp.concatenate([a, b], axis=-1)
        return BatchNorm(self.affine, self.dtype)(out, train)


class FacConv(nn.Module):
    """ReLU - Conv(Kx1) - Conv(1xK) - BN (operations.py:174-188)."""

    features: int
    kernel_length: int
    stride: int
    padding: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        c_in = x.shape[-1]
        k, s, p = self.kernel_length, self.stride, self.padding
        x = nn.relu(x)
        x = Conv(c_in, (k, 1), (s, 1), (p, 0), use_bias=False,
                 dtype=self.dtype)(x)
        x = Conv(self.features, (1, k), (1, s), (0, p), use_bias=False,
                 dtype=self.dtype)(x)
        return BatchNorm(self.affine, self.dtype)(x, train)


class PooledConv(nn.Module):
    """AvgPool2 - [ReLU-Conv-BN]*n - bilinear up x2 (operations.py:222-251)."""

    features: int
    kernel: int
    stride: int
    padding: int
    conv_nums: int
    affine: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = pooling.avg_pool(x, 2, 2, 0)
        for _ in range(self.conv_nums):
            x = nn.relu(x)
            x = Conv(self.features, (self.kernel, self.kernel),
                     (self.stride, self.stride), (self.padding, self.padding),
                     use_bias=True, dtype=self.dtype)(x)
            x = BatchNorm(self.affine, self.dtype)(x, train)
        x = resize_scale(x, 2.0, align_corners=True)
        if self.conv_nums == 2 and self.stride == 2:
            x = resize_scale(x, 2.0, align_corners=True)
        return x


# Factory table matching reference OPS (operations.py:9-25).
# Each factory: (C, stride, affine, dtype) -> module whose __call__ is
# (x, train) -> y.
OPS: dict[str, Callable[..., nn.Module]] = {
    "none": lambda c, s, a, d=None: Zero(s),
    "avg_pool_3x3": lambda c, s, a, d=None: PoolBN("avg", 3, s, 1, a, d),
    "max_pool_3x3": lambda c, s, a, d=None: PoolBN("max", 3, s, 1, a, d),
    "skip_connect": lambda c, s, a, d=None: (
        Identity() if s == 1 else FactorizedReduce(c, a, d)),
    "std_conv_3x3": lambda c, s, a, d=None: ReLUConvBN(c, 3, s, 1, a, d),
    "std_conv_1x1": lambda c, s, a, d=None: ReLUConvBN(c, 1, s, 0, a, d),
    "dil_conv_3x3_2": lambda c, s, a, d=None: DilConvS(c, 3, s, 2, 2, a, d),
    "dil_conv_3x3_4": lambda c, s, a, d=None: DilConvS(c, 3, s, 4, 4, a, d),
    "dil_conv_5x5_4": lambda c, s, a, d=None: DilConvS(c, 5, s, 4, 2, a, d),
    "se_connect": lambda c, s, a, d=None: SEBlock(s, a, d),
    "conv_7x1_1x7": lambda c, s, a, d=None: FacConv(c, 7, s, 3, a, d),
    "sep_conv_3x3": lambda c, s, a, d=None: SepConv(c, 3, s, 1, a, d),
    "sep_conv_5x5": lambda c, s, a, d=None: SepConv(c, 5, s, 2, a, d),
    "poled_conv_x1": lambda c, s, a, d=None: PooledConv(c, 3, s, 1, 1, a, d),
    "poled_conv_x2": lambda c, s, a, d=None: PooledConv(c, 3, s, 1, 2, a, d),
}


def make_op(name: str, channels: int, stride: int, affine: bool,
            dtype: Any = None) -> nn.Module:
    return OPS[name](channels, stride, affine, dtype)
