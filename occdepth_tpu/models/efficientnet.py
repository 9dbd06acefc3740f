"""EfficientNet (tf_efficientnet_*_ns) backbone in flax, channels-last.

Re-implements the `rwightman/gen-efficientnet-pytorch` models the reference
loads via torch.hub (occdepth/models/unet2d.py:238-240), with the properties
checkpoint parity depends on:

  * TF-SAME asymmetric padding on every conv (flax padding='SAME' == TF),
  * BatchNorm eps 1e-3 (the tf_ variants' TF-default), momentum 0.1,
  * SiLU activations, SE ratio 0.25 of block *input* channels,
  * per-variant width/depth scaling with the divisor-8 channel rounding.

The encoder taps the same intermediate features as the reference's Encoder
(unet2d.py:137-144 uses features[0, 4, 5, 6, 8, 11] == input, stage0..2,
stage4, conv_head output *before* bn2).
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (width_coefficient, depth_coefficient)
VARIANTS = {
    "tf_efficientnet_b0_ns": (1.0, 1.0),
    "tf_efficientnet_b3_ns": (1.2, 1.4),
    "tf_efficientnet_b4_ns": (1.4, 1.8),
    "tf_efficientnet_b5_ns": (1.6, 2.2),
    "tf_efficientnet_b7_ns": (2.0, 3.1),
}

# EfficientNet-B0 stages: (expand_ratio, channels, repeats, stride, kernel)
B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
STEM_CHS = 32
HEAD_CHS = 1280
BN_EPS_TF = 1e-3


def round_channels(chs: float, multiplier: float, divisor: int = 8) -> int:
    chs *= multiplier
    new = max(divisor, int(chs + divisor / 2) // divisor * divisor)
    if new < 0.9 * chs:
        new += divisor
    return int(new)


def round_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(multiplier * repeats))


def variant_channels(name: str) -> dict:
    """Per-variant derived channel table (stage outputs + stem + head)."""
    w, d = VARIANTS[name]
    return {
        "stem": round_channels(STEM_CHS, w),
        "stages": tuple(round_channels(c, w) for (_, c, _, _, _) in B0_STAGES),
        "head": round_channels(HEAD_CHS, w),
        "repeats": tuple(round_repeats(r, d) for (_, _, r, _, _) in B0_STAGES),
    }


class TfBatchNorm(nn.Module):
    """BN with the tf_efficientnet eps (1e-3), fp32 stats."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        from occdepth_tpu.models.layers import _BNCore

        # _BNCore = nn.BatchNorm bit-identical math, but the fp32
        # stats+normalize are rematerialized in the backward instead of
        # storing an fp32 copy of every encoder activation (layers.py).
        return _BNCore(momentum=0.9, epsilon=BN_EPS_TF, name="BatchNorm_0")(
            x, use_running_average=not train
        )


class DWConvFast(nn.Module):
    """Depthwise conv, param-identical to
    nn.Conv(C, (k, k), feature_group_count=C, use_bias=False): one "kernel"
    param of shape (k, k, 1, C), same initializer, same promote-to-dtype
    semantics — checkpoints and the torch converter are unaffected.  The
    forward is the same XLA conv; stride-1 odd-kernel blocks can route
    through the fused Pallas filter-gradient VJP (ops/dw_conv.py), which
    replaces XLA's ~10x-the-forward depthwise filter-gradient lowering.
    """

    kernel_size: int
    stride: int = 1
    dw_grad: str = "xla"  # "xla" | "auto" | "pallas"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from occdepth_tpu.ops.dw_conv import (
            dw_conv2d_fastgrad, use_fast_dw_grad,
        )

        k, s, C = self.kernel_size, self.stride, x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (k, k, 1, C),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        if use_fast_dw_grad(self.dw_grad, k, s):
            return dw_conv2d_fastgrad(x, kernel)
        return jax.lax.conv_general_dilated(
            x, kernel, (s, s), "SAME", feature_group_count=C,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class SqueezeExcite(nn.Module):
    reduced_chs: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        se = x.mean(axis=(1, 2), keepdims=True)
        se = nn.Conv(self.reduced_chs, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="conv_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(c, (1, 1), dtype=self.dtype,
                     param_dtype=jnp.float32, name="conv_expand")(se)
        return x * nn.sigmoid(se)


class MBConv(nn.Module):
    """Inverted residual block (gen-efficientnet InvertedResidual)."""

    out_chs: int
    expand_ratio: int
    stride: int
    kernel: int
    se_ratio: float = 0.25
    dw_grad: str = "xla"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_chs = x.shape[-1]
        mid = in_chs * self.expand_ratio
        shortcut = x
        if self.expand_ratio != 1:
            x = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv_pw")(x)
            x = TfBatchNorm(dtype=self.dtype, name="bn1")(x, train)
            x = nn.silu(x)
        x = DWConvFast(
            self.kernel, self.stride, dw_grad=self.dw_grad,
            dtype=self.dtype, name="conv_dw",
        )(x)
        x = TfBatchNorm(dtype=self.dtype, name="bn2")(x, train)
        x = nn.silu(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(
                max(1, int(in_chs * self.se_ratio)), dtype=self.dtype, name="se"
            )(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_pwl")(x)
        x = TfBatchNorm(dtype=self.dtype, name="bn3")(x, train)
        if self.stride == 1 and in_chs == self.out_chs:
            x = x + shortcut
        return x


class DepthwiseSeparable(nn.Module):
    """Stage-0 block (expand ratio 1, no pointwise expansion)."""

    out_chs: int
    kernel: int
    se_ratio: float = 0.25
    dw_grad: str = "xla"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool):
        in_chs = x.shape[-1]
        shortcut = x
        x = DWConvFast(
            self.kernel, 1, dw_grad=self.dw_grad, dtype=self.dtype,
            name="conv_dw",
        )(x)
        x = TfBatchNorm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.silu(x)
        x = SqueezeExcite(
            max(1, int(in_chs * self.se_ratio)), dtype=self.dtype, name="se"
        )(x)
        x = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_pw")(x)
        x = TfBatchNorm(dtype=self.dtype, name="bn2")(x, train)
        if in_chs == self.out_chs:
            x = x + shortcut
        return x


class EfficientNetEncoder(nn.Module):
    """EfficientNet trunk returning the UNet2D taps.

    Output tuple mirrors the reference feature indices
    (unet2d.py:137-144): (input, stage0, stage1, stage2, stage4, head).
    """

    variant: str = "tf_efficientnet_b3_ns"
    dw_grad: str = "xla"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> Tuple[jnp.ndarray, ...]:
        cfg = variant_channels(self.variant)
        taps = [x]
        h = nn.Conv(
            cfg["stem"], (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name="conv_stem",
        )(x)
        h = TfBatchNorm(dtype=self.dtype, name="bn1")(h, train)
        h = nn.silu(h)

        stage_outs = []
        for si, (expand, _, _, stride, kernel) in enumerate(B0_STAGES):
            out_chs = cfg["stages"][si]
            for bi in range(cfg["repeats"][si]):
                s = stride if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if expand == 1:
                    h = DepthwiseSeparable(
                        out_chs, kernel, dw_grad=self.dw_grad,
                        dtype=self.dtype, name=name
                    )(h, train)
                else:
                    h = MBConv(
                        out_chs, expand, s, kernel, dw_grad=self.dw_grad,
                        dtype=self.dtype, name=name
                    )(h, train)
            stage_outs.append(h)

        head = nn.Conv(
            cfg["head"], (1, 1), use_bias=False, dtype=self.dtype,
            param_dtype=jnp.float32, name="conv_head",
        )(h)
        # reference taps conv_head *before* bn2/act2 (features[11])
        return (
            taps[0],
            stage_outs[0],
            stage_outs[1],
            stage_outs[2],
            stage_outs[4],
            head,
        )
