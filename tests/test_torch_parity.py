"""Module-level parity vs torch oracles, through the checkpoint converter.

These tests build small torch modules with the reference's layer semantics
(eval mode), convert their state_dicts with training/convert_torch.py, and
assert our flax modules produce the same outputs — pinning conv layouts,
BN eps/momentum, transposed-conv padding, and the converter itself.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from occdepth_tpu.training.convert_torch import (
    _conv2d,
    _conv3d,
    _convT3d,
    _Mapper,
    _map_bottleneck3d,
    _nest,
)


def _to_jnp(x):
    return jnp.asarray(x.detach().numpy())


def test_conv3d_layout(rng):
    tconv = nn.Conv3d(4, 6, 3, padding=1, bias=True)
    x = torch.randn(1, 4, 5, 6, 7)
    ref = tconv(x).detach().numpy()

    import flax.linen as fnn

    from occdepth_tpu.models.layers import torch_conv

    conv = torch_conv(6, (3, 3, 3))
    params = {
        "kernel": _conv3d(tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy(),
    }
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = conv.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-5
    )


@pytest.mark.parametrize("stride,outpad,pad", [(2, 1, 1), (1, 0, 1)])
def test_convtranspose3d_layout(stride, outpad, pad):
    tconv = nn.ConvTranspose3d(4, 6, 3, stride=stride, padding=pad,
                               output_padding=outpad)
    x = torch.randn(1, 4, 4, 5, 6)
    ref = tconv(x).detach().numpy()

    import flax.linen as fnn

    lo = 3 - 1 - pad
    hi = 3 - 1 - pad + outpad
    conv = fnn.ConvTranspose(
        6, (3, 3, 3), strides=(stride,) * 3,
        padding=((lo, hi),) * 3, transpose_kernel=True,
    )
    params = {
        "kernel": _convT3d(tconv.weight.detach().numpy()),
        "bias": tconv.bias.detach().numpy(),
    }
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = conv.apply({"params": params}, xj)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-4
    )


class TorchDDRBottleneck(nn.Module):
    """Oracle with the reference DDR semantics (DDR.py:35-139)."""

    def __init__(self, inplanes, planes, stride=1, dilation=(1, 1, 1),
                 expansion=4, with_projection=False, bn_momentum=0.0003):
        super().__init__()
        d = dilation
        bn = lambda c: nn.BatchNorm3d(c, momentum=bn_momentum)
        self.conv1 = nn.Conv3d(inplanes, planes, 1, bias=False)
        self.bn1 = bn(planes)
        self.conv2 = nn.Conv3d(planes, planes, (1, 1, 3), (1, 1, stride),
                               padding=(0, 0, d[0]), dilation=(1, 1, d[0]),
                               bias=False)
        self.bn2 = bn(planes)
        self.conv3 = nn.Conv3d(planes, planes, (1, 3, 1), (1, stride, 1),
                               padding=(0, d[1], 0), dilation=(1, d[1], 1),
                               bias=False)
        self.bn3 = bn(planes)
        self.conv4 = nn.Conv3d(planes, planes, (3, 1, 1), (stride, 1, 1),
                               padding=(d[2], 0, 0), dilation=(d[2], 1, 1),
                               bias=False)
        self.bn4 = bn(planes)
        self.conv5 = nn.Conv3d(planes, planes * expansion, 1, bias=False)
        self.bn5 = bn(planes * expansion)
        self.stride = stride
        if stride != 1:
            mk = lambda k: nn.Sequential(
                nn.AvgPool3d(kernel_size=k, stride=k),
                nn.Conv3d(planes, planes, 1, bias=False),
                bn(planes),
            )
            self.downsample2 = mk((1, stride, 1))
            self.downsample3 = mk((stride, 1, 1))
            self.downsample4 = mk((stride, 1, 1))
        self.downsample = None
        if with_projection:
            self.downsample = nn.Sequential(
                nn.AvgPool3d(2, 2),
                nn.Conv3d(inplanes, planes * expansion, 1, bias=False),
                bn(planes * expansion),
            )

    def forward(self, x):
        relu = torch.relu
        out1 = relu(self.bn1(self.conv1(x)))
        out2 = self.bn2(self.conv2(out1))
        out3 = self.bn3(self.conv3(relu(out2)))
        if self.stride != 1:
            out2 = self.downsample2(out2)
        out3 = out3 + out2
        out4 = self.bn4(self.conv4(relu(out3)))
        if self.stride != 1:
            out2 = self.downsample3(out2)
            out3 = self.downsample4(out3)
        out4 = out4 + out2 + out3
        out5 = self.bn5(self.conv5(relu(out4)))
        residual = x if self.downsample is None else self.downsample(x)
        return relu(out5 + residual)


@pytest.mark.parametrize("stride,proj", [(1, False), (2, True)])
def test_ddr_bottleneck_parity(stride, proj, rng):
    from occdepth_tpu.models.unet3d_blocks import Bottleneck3D

    torch.manual_seed(0)
    tmod = TorchDDRBottleneck(16, 4, stride=stride, dilation=(2, 2, 2),
                              expansion=8 if proj else 4,
                              with_projection=proj).eval()
    # randomize BN stats so the test catches eps/stat handling
    for mod in tmod.modules():
        if isinstance(mod, nn.BatchNorm3d):
            mod.running_mean.data = torch.randn_like(mod.running_mean) * 0.1
            mod.running_var.data = torch.rand_like(mod.running_var) + 0.5
            mod.weight.data = torch.randn_like(mod.weight) * 0.2 + 1
            mod.bias.data = torch.randn_like(mod.bias) * 0.1

    x = torch.randn(1, 16, 4, 6, 8)
    ref = tmod(x).detach().numpy()

    sd = {f"blk.{k}": v.detach().numpy() for k, v in tmod.state_dict().items()}
    m = _Mapper(sd)
    _map_bottleneck3d(m, "blk", "blk", stride=stride, has_downsample=proj)
    assert not m.missing, m.missing
    params = _nest(m.params)["blk"]
    stats = _nest(m.stats)["blk"]

    fmod = Bottleneck3D(
        planes=4, stride=stride, dilation=(2, 2, 2),
        expansion=8 if proj else 4, has_downsample=proj,
    )
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = fmod.apply({"params": params, "batch_stats": stats}, xj,
                     train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=2e-4
    )
