"""2D UNet: EfficientNet encoder + BN-upsample decoder.

Reference: occdepth/models/unet2d.py:24-255 (AdaBins-style decoder).  The
decoder upsamples bilinearly (align_corners=True) to each skip's size,
concatenates, and applies two Conv-BN-LeakyReLU blocks; per-scale 1x1
"resize" convs produce the `feature_2d_oc`-channel multi-scale dict
{'1_1','1_2','1_4','1_8','1_16'}.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from occdepth_tpu.models.efficientnet import EfficientNetEncoder, variant_channels
from occdepth_tpu.models.layers import BatchNorm, leaky_relu, torch_conv
from occdepth_tpu.ops.conv2d_shift import Conv3x3Fast, resolve_conv_impl
from occdepth_tpu.ops.resize import resize_bilinear


class UpSampleBN(nn.Module):
    """Upsample-to-skip + concat + 2x (conv3x3, BN, LeakyReLU).

    Reference unet2d.py:24-46.  The 3x3 convs dispatch through
    Conv3x3Fast (identical params to nn.Conv): XLA's conv lowering runs
    ~10x below MXU peak at these large-spatial/small-channel shapes, the
    shifted-matmul paths do not (ops/conv2d_shift.py).
    """

    output_features: int
    dtype: Optional[Any] = None
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, skip, train: bool):
        impl = resolve_conv_impl(self.conv_impl, train)
        up = resize_bilinear(x, (skip.shape[-3], skip.shape[-2]), align_corners=True)
        h = jnp.concatenate([up, skip.astype(up.dtype)], axis=-1)
        h = Conv3x3Fast(self.output_features, dtype=self.dtype, name="conv0")(h, impl)
        h = BatchNorm(name="bn0", dtype=self.dtype)(h, train)
        h = leaky_relu(h)
        h = Conv3x3Fast(self.output_features, dtype=self.dtype, name="conv1")(h, impl)
        h = BatchNorm(name="bn1", dtype=self.dtype)(h, train)
        h = leaky_relu(h)
        return h


class UNet2D(nn.Module):
    """Encoder + DecoderBN producing the multi-scale feature dict.

    `return_up_feats` keeps decoder stages only down to that scale
    (reference unet2d.py:80-131).
    """

    backbone_2d_name: str = "tf_efficientnet_b3_ns"
    out_feature: int = 32
    return_up_feats: int = 1
    dtype: Optional[Any] = None
    conv_impl: str = "xla"  # UpSampleBN 3x3 conv path ("auto" on TPU)
    dw_grad: str = "xla"  # encoder depthwise-conv VJP (ops/dw_conv.py)

    @nn.compact
    def __call__(self, img, train: bool = False) -> Dict[str, jnp.ndarray]:
        x_in, b0, b1, b2, b4, head = EfficientNetEncoder(
            self.backbone_2d_name, dw_grad=self.dw_grad, dtype=self.dtype,
            name="encoder"
        )(img, train=train)

        features = variant_channels(self.backbone_2d_name)["head"]
        # reference quirk: 1x1 conv with padding=1 grows dims by 2; the
        # following bilinear resize to the skip's size absorbs it
        # (unet2d.py:65-67).
        x_d0 = nn.Conv(
            features, (1, 1), padding=((1, 1), (1, 1)), dtype=self.dtype,
            param_dtype=jnp.float32, name="conv2",
        )(head)

        res: Dict[str, jnp.ndarray] = {}
        r = self.return_up_feats
        f = features
        x = x_d0
        if r <= 16:
            x = UpSampleBN(f // 2, dtype=self.dtype, conv_impl=self.conv_impl, name="up16")(x, b4, train)
            res["1_16"] = torch_conv(
                self.out_feature, (1, 1), padding=(0,) * 2, dtype=self.dtype,
                name="resize_output_1_16",
            )(x)
        if r <= 8:
            x = UpSampleBN(f // 4, dtype=self.dtype, conv_impl=self.conv_impl, name="up8")(x, b2, train)
            res["1_8"] = torch_conv(
                self.out_feature, (1, 1), padding=(0,) * 2, dtype=self.dtype,
                name="resize_output_1_8",
            )(x)
        if r <= 4:
            x = UpSampleBN(f // 8, dtype=self.dtype, conv_impl=self.conv_impl, name="up4")(x, b1, train)
            res["1_4"] = torch_conv(
                self.out_feature, (1, 1), padding=(0,) * 2, dtype=self.dtype,
                name="resize_output_1_4",
            )(x)
        if r <= 2:
            x = UpSampleBN(f // 16, dtype=self.dtype, conv_impl=self.conv_impl, name="up2")(x, b0, train)
            res["1_2"] = torch_conv(
                self.out_feature, (1, 1), padding=(0,) * 2, dtype=self.dtype,
                name="resize_output_1_2",
            )(x)
        if r <= 1:
            x = UpSampleBN(f // 32, dtype=self.dtype, conv_impl=self.conv_impl, name="up1")(x, x_in, train)
            res["1_1"] = torch_conv(
                self.out_feature, (1, 1), padding=(0,) * 2, dtype=self.dtype,
                name="resize_output_1_1",
            )(x)
        return res
