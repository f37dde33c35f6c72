"""Context/head modules: PSP, strip pooling, SPHead, ASPP, PMSF.

TPU-native equivalents of reference ``models/module.py`` (StripPooling:9,
SPHead:62, PSPModule:91, ASPP:121, PMSF:190). The reference defines these but
its released forward path does not call them; they are provided for API
parity and for custom heads.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from npp_tpu.ops import pooling
from npp_tpu.ops.primitives import BatchNorm, Conv
from npp_tpu.ops.resize import resize_bilinear, resize_scale


class _ConvBN(nn.Module):
    features: int
    kernel: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    relu: bool = False
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv(self.features, self.kernel, padding=self.padding,
                 use_bias=self.use_bias, dtype=self.dtype)(x)
        x = BatchNorm(True, self.dtype)(x, train)
        if self.relu:
            x = nn.relu(x)
        return x


class StripPooling(nn.Module):
    """Strip pooling block (module.py:9-60)."""

    pool_size: tuple[int, int] = (20, 12)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        c = x.shape[-1]
        inter = c // 4
        x1 = _ConvBN(inter, relu=True, dtype=self.dtype)(x, train)
        x2 = _ConvBN(inter, relu=True, dtype=self.dtype)(x, train)
        x2_1 = _ConvBN(inter, (3, 3), (1, 1), dtype=self.dtype)(x1, train)
        p1 = pooling.adaptive_avg_pool(x1, (self.pool_size[0], self.pool_size[0]))
        x2_2 = resize_bilinear(
            _ConvBN(inter, (3, 3), (1, 1), dtype=self.dtype)(p1, train),
            (h, w), align_corners=True)
        p2 = pooling.adaptive_avg_pool(x1, (self.pool_size[1], self.pool_size[1]))
        x2_3 = resize_bilinear(
            _ConvBN(inter, (3, 3), (1, 1), dtype=self.dtype)(p2, train),
            (h, w), align_corners=True)
        p3 = pooling.adaptive_avg_pool(x2, (1, w))
        x2_4 = resize_bilinear(
            _ConvBN(inter, (1, 3), (0, 1), dtype=self.dtype)(p3, train),
            (h, w), align_corners=True)
        p4 = pooling.adaptive_avg_pool(x2, (h, 1))
        x2_5 = resize_bilinear(
            _ConvBN(inter, (3, 1), (1, 0), dtype=self.dtype)(p4, train),
            (h, w), align_corners=True)
        y1 = _ConvBN(inter, (3, 3), (1, 1), relu=True, dtype=self.dtype)(
            nn.relu(x2_1 + x2_2 + x2_3), train)
        y2 = _ConvBN(inter, (3, 3), (1, 1), relu=True, dtype=self.dtype)(
            nn.relu(x2_5 + x2_4), train)
        out = _ConvBN(c, dtype=self.dtype)(
            jnp.concatenate([y1, y2], axis=-1), train)
        return nn.relu(x + out)


class SPHead(nn.Module):
    """Strip-pooling head (module.py:62-89)."""

    out_features: int
    pool_size: tuple[int, int] = (20, 12)
    bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        inter = x.shape[-1] // 2
        x = _ConvBN(inter, relu=True, dtype=self.dtype)(x, train)
        x = StripPooling(self.pool_size, self.dtype)(x, train)
        x = StripPooling(self.pool_size, self.dtype)(x, train)
        if self.bias:
            x = _ConvBN(inter // 2, (3, 3), (1, 1), relu=True,
                        dtype=self.dtype)(x, train)
            x = Conv(self.out_features, (1, 1), use_bias=True,
                     dtype=self.dtype)(x)
        else:
            x = _ConvBN(self.out_features, (3, 3), (1, 1), relu=True,
                        dtype=self.dtype)(x, train)
        return x


class PSPModule(nn.Module):
    """Pyramid scene parsing module (module.py:91-119)."""

    out_features: int = 512
    sizes: Sequence[int] = (1, 2, 3, 6)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        priors = []
        for size in self.sizes:
            p = pooling.adaptive_avg_pool(x, (size, size))
            p = Conv(self.out_features, (1, 1), use_bias=False,
                     dtype=self.dtype)(p)
            p = BatchNorm(True, self.dtype)(p, train)
            priors.append(resize_bilinear(p, (h, w), align_corners=True))
        priors.append(x)
        y = jnp.concatenate(priors, axis=-1)
        y = Conv(self.out_features, (3, 3), padding=(1, 1), use_bias=False,
                 dtype=self.dtype)(y)
        y = BatchNorm(True, self.dtype)(y, train)
        return nn.relu(y)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (module.py:121-178 rates 12/24/36).

    Note the reference reuses one BN instance across all five branches — a
    quirk we reproduce by sharing the BN module.
    """

    depth: int = 256
    rates: Sequence[int] = (12, 24, 36)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        shared_bn = BatchNorm(True, self.dtype)
        gap = pooling.global_avg_pool(x)
        gap = shared_bn(Conv(self.depth, (1, 1), dtype=self.dtype)(gap), train)
        gap = resize_bilinear(gap, (h, w), align_corners=False)
        branches = [gap,
                    shared_bn(Conv(self.depth, (1, 1), dtype=self.dtype)(x),
                              train)]
        for r in self.rates:
            b = Conv(self.depth, (3, 3), padding=(r, r), dilation=(r, r),
                     dtype=self.dtype)(x)
            branches.append(shared_bn(b, train))
        y = jnp.concatenate(branches, axis=-1)
        y = Conv(self.depth, (1, 1), use_bias=False, dtype=self.dtype)(y)
        y = BatchNorm(True, self.dtype)(y, train)
        return nn.relu(y)


class PMSF(nn.Module):
    """Pose multi-scale fusion (module.py:190-213)."""

    out_features: int = 256
    sizes: Sequence[float] = (1, 0.5, 0.25, 0.125)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[-3], x.shape[-2]
        priors = []
        for size in self.sizes:
            p = resize_scale(x, size, align_corners=True) if size != 1 else x
            p = Conv(self.out_features, (1, 1), use_bias=False,
                     dtype=self.dtype)(p)
            p = BatchNorm(True, self.dtype)(p, train)
            priors.append(resize_bilinear(p, (h, w), align_corners=True))
        y = jnp.concatenate(priors, axis=-1)
        y = Conv(self.out_features, (3, 3), padding=(1, 1), use_bias=False,
                 dtype=self.dtype)(y)
        y = BatchNorm(True, self.dtype)(y, train)
        return nn.relu(y)
