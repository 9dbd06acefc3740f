"""3D building blocks: DDR bottleneck, Process/Up/Downsample, ASPP, heads.

References: occdepth/models/DDR.py:35-139 (factorized 3D residual
bottleneck), occdepth/models/modules.py (ASPP, segmentation heads,
Process/Upsample/Downsample/Convblock3d).

Layout: (B, X, Y, Z, C) channels-last.  Torch's (D, H, W) spatial order maps
to our (X, Y, Z), so e.g. a torch kernel (1, 1, 3) factorizes along Z.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from occdepth_tpu.ops.layout_pin import granular, pin_grid
from occdepth_tpu.models.layers import BatchNorm, torch_conv


def _avg_pool3d(x, window: Tuple[int, int, int], strides: Tuple[int, int, int]):
    return nn.avg_pool(x, window, strides=strides, padding="VALID")


class Bottleneck3D(nn.Module):
    """DDR factorized 3D residual bottleneck (DDR.py:35-139).

    1x1x1 -> (1,1,3) -> (1,3,1) -> (3,1,1) -> 1x1x1 with additive
    inter-branch fusion; avg-pool shortcuts when stride != 1.
    """

    planes: int
    stride: int = 1
    dilation: Tuple[int, int, int] = (1, 1, 1)
    expansion: int = 4
    has_downsample: bool = False  # projection shortcut (used by Downsample)
    bn_momentum: float = 0.0003
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        p, s, d = self.planes, self.stride, self.dilation
        bn = lambda name: BatchNorm(self.bn_momentum, dtype=self.dtype, name=name)

        out1 = nn.relu(bn("bn1")(
            torch_conv(p, (1, 1, 1), use_bias=False, dtype=self.dtype,
                       name="conv1")(x), train))
        out2 = bn("bn2")(
            torch_conv(p, (1, 1, 3), strides=(1, 1, s), padding=(0, 0, d[0]),
                       dilation=(1, 1, d[0]), use_bias=False, dtype=self.dtype,
                       name="conv2")(out1), train)
        out2_relu = nn.relu(out2)

        out3 = bn("bn3")(
            torch_conv(p, (1, 3, 1), strides=(1, s, 1), padding=(0, d[1], 0),
                       dilation=(1, d[1], 1), use_bias=False, dtype=self.dtype,
                       name="conv3")(out2_relu), train)
        if s != 1:
            out2 = _avg_pool3d(out2, (1, s, 1), (1, s, 1))
            out2 = torch_conv(p, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name="downsample2_conv")(out2)
            out2 = bn("downsample2_bn")(out2, train)
        out3 = out3 + out2
        out3_relu = nn.relu(out3)

        out4 = bn("bn4")(
            torch_conv(p, (3, 1, 1), strides=(s, 1, 1), padding=(d[2], 0, 0),
                       dilation=(d[2], 1, 1), use_bias=False, dtype=self.dtype,
                       name="conv4")(out3_relu), train)
        if s != 1:
            out2 = _avg_pool3d(out2, (s, 1, 1), (s, 1, 1))
            out2 = torch_conv(p, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name="downsample3_conv")(out2)
            out2 = bn("downsample3_bn")(out2, train)
            out3 = _avg_pool3d(out3, (s, 1, 1), (s, 1, 1))
            out3 = torch_conv(p, (1, 1, 1), use_bias=False, dtype=self.dtype,
                              name="downsample4_conv")(out3)
            out3 = bn("downsample4_bn")(out3, train)
        out4 = out4 + out2 + out3
        out4_relu = nn.relu(out4)

        out5 = bn("bn5")(
            torch_conv(p * self.expansion, (1, 1, 1), use_bias=False,
                       dtype=self.dtype, name="conv5")(out4_relu), train)

        residual = x
        if self.has_downsample:
            residual = _avg_pool3d(x, (2, 2, 2), (2, 2, 2))
            residual = torch_conv(
                p * self.expansion, (1, 1, 1), use_bias=False, dtype=self.dtype,
                name="downsample_conv")(residual)
            residual = bn("downsample_bn")(residual, train)
        return nn.relu(out5 + residual)


class Process(nn.Module):
    """Sequence of dilated DDR bottlenecks (modules.py:258-275)."""

    feature: int
    dilations: Sequence[int] = (1, 2, 3)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        for i, d in enumerate(self.dilations):
            x = Bottleneck3D(
                self.feature // 4, dilation=(d, d, d),
                bn_momentum=self.bn_momentum, dtype=self.dtype, name=f"block{i}",
            )(x, train)
        return x


class Downsample(nn.Module):
    """Stride-2 DDR bottleneck with projection shortcut (modules.py:320-344)."""

    feature: int
    expansion: int = 8
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return Bottleneck3D(
            self.feature // 4, stride=2, expansion=self.expansion,
            has_downsample=True, bn_momentum=self.bn_momentum,
            dtype=self.dtype, name="main",
        )(x, train)


class Upsample(nn.Module):
    """ConvTranspose3d(k3, s2, p1, op1) + BN + ReLU (modules.py:278-296)."""

    out_channels: int
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        from occdepth_tpu.ops.conv3d_fast import ConvTranspose3DFast

        # lax padding (k-1-p, k-1-p+op) = (1, 2) doubles each spatial dim
        x = ConvTranspose3DFast(
            self.out_channels, (3, 3, 3), strides=(2, 2, 2),
            padding=((1, 2), (1, 2), (1, 2)),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        x = BatchNorm(self.bn_momentum, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class Convblock3d(nn.Module):
    """Stride-1 ConvTranspose3d block for project_scale=1 (modules.py:299-317)."""

    out_channels: int
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        from occdepth_tpu.ops.conv3d_fast import ConvTranspose3DFast

        x = ConvTranspose3DFast(
            self.out_channels, (3, 3, 3), strides=(1, 1, 1),
            padding=((1, 1), (1, 1), (1, 1)),
            dtype=self.dtype, param_dtype=jnp.float32, name="conv",
        )(x)
        x = BatchNorm(self.bn_momentum, dtype=self.dtype, name="bn")(x, train)
        return nn.relu(x)


class ASPP3D(nn.Module):
    """Residual multi-dilation ASPP (modules.py:6-48)."""

    planes: int
    dilations: Sequence[int] = (1, 2, 3)
    bn_momentum: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        bn = lambda name: BatchNorm(self.bn_momentum, dtype=self.dtype, name=name)
        y = None
        for i, d in enumerate(self.dilations):
            h = torch_conv(self.planes, (3, 3, 3), padding=(d, d, d),
                           dilation=(d, d, d), use_bias=False, dtype=self.dtype,
                           name=f"conv1_{i}")(x)
            h = nn.relu(bn(f"bn1_{i}")(h, train))
            h = torch_conv(self.planes, (3, 3, 3), padding=(d, d, d),
                           dilation=(d, d, d), use_bias=False, dtype=self.dtype,
                           name=f"conv2_{i}")(h)
            h = bn(f"bn2_{i}")(h, train)
            y = h if y is None else y + h
        return nn.relu(y + x)


class SegmentationHead(nn.Module):
    """conv0 -> ASPP block -> class conv (modules.py:51-106).

    With `cascade_cls` an occupancy (2-class) conv is added whose softmax is
    concatenated before the class conv; returns (ssc_logit, occ_logit)
    (modules.py:109-175).  `occluded_only` gives the occluded-voxel head
    variant that returns just the 2-class logit (modules.py:178-235).
    """

    planes: int
    n_classes: int
    dilations: Sequence[int] = (1, 2, 3)
    cascade_cls: bool = False
    occluded_only: bool = False
    layout_pin: str = "off"  # '-all' modes pin the interior chain too
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        # interior pins only under the granular ('-all') experiment modes;
        # seam pins are the caller's (unet3d.py) responsibility
        pin = (lambda t: pin_grid(t, self.layout_pin)) \
            if granular(self.layout_pin) else (lambda t: t)
        bn = lambda name: BatchNorm(0.1, dtype=self.dtype, name=name)
        x = pin(nn.relu(torch_conv(self.planes, (3, 3, 3), dtype=self.dtype,
                                   name="conv0")(x)))
        y = None
        for i, d in enumerate(self.dilations):
            h = torch_conv(self.planes, (3, 3, 3), padding=(d, d, d),
                           dilation=(d, d, d), use_bias=False, dtype=self.dtype,
                           name=f"conv1_{i}")(x)
            h = pin(nn.relu(bn(f"bn1_{i}")(h, train)))
            h = torch_conv(self.planes, (3, 3, 3), padding=(d, d, d),
                           dilation=(d, d, d), use_bias=False, dtype=self.dtype,
                           name=f"conv2_{i}")(h)
            h = pin(bn(f"bn2_{i}")(h, train))
            y = h if y is None else y + h
        x = pin(nn.relu(y + x))

        if self.occluded_only:
            return torch_conv(2, (3, 3, 3), dtype=self.dtype, name="occ_classes")(x)

        if self.cascade_cls:
            occ = torch_conv(2, (3, 3, 3), dtype=self.dtype, name="occ_classes")(x)
            occ_softmax = nn.softmax(occ.astype(jnp.float32), axis=-1).astype(x.dtype)
            x = pin(jnp.concatenate([x, occ_softmax], axis=-1))
            ssc = torch_conv(self.n_classes, (3, 3, 3), dtype=self.dtype,
                             name="conv_classes")(x)
            return ssc, occ
        return torch_conv(self.n_classes, (3, 3, 3), dtype=self.dtype,
                          name="conv_classes")(x)
