"""Parity of the EfficientNet MBConv block and UNet2D decoder pieces vs
torch oracles (TF-SAME padding, SE gating, BN eps 1e-3, LeakyReLU decoder,
align_corners=True upsampling)."""
import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occdepth_tpu.training.convert_torch import _conv2d, _Mapper, _nest


def tf_same_pad(x, k, s):
    """TF-SAME asymmetric padding for torch (extra on bottom/right)."""
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(
        x, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)
    )


class TorchMBConv(nn.Module):
    """gen-efficientnet InvertedResidual oracle (tf variant, eval mode)."""

    def __init__(self, in_chs, out_chs, expand, k, stride, se_ratio=0.25):
        super().__init__()
        mid = in_chs * expand
        bn = lambda c: nn.BatchNorm2d(c, eps=1e-3)
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = bn(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = bn(mid)
        se_chs = max(1, int(in_chs * se_ratio))
        self.se = nn.ModuleDict({
            "conv_reduce": nn.Conv2d(mid, se_chs, 1),
            "conv_expand": nn.Conv2d(se_chs, mid, 1),
        })
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = bn(out_chs)
        self.k, self.stride = k, stride
        self.has_skip = stride == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = tf_same_pad(h, self.k, self.stride)
        h = F.silu(self.bn2(self.conv_dw(h)))
        se = h.mean((2, 3), keepdim=True)
        se = self.se["conv_expand"](F.silu(self.se["conv_reduce"](se)))
        h = h * torch.sigmoid(se)
        h = self.bn3(self.conv_pwl(h))
        return h + sc if self.has_skip else h


@pytest.mark.parametrize("stride,k,skip", [(1, 3, True), (2, 5, False)])
def test_mbconv_parity(stride, k, skip, rng):
    from occdepth_tpu.models.efficientnet import MBConv

    torch.manual_seed(1)
    in_chs, out_chs = 16, 16 if skip else 24
    tmod = TorchMBConv(in_chs, out_chs, 6, k, stride).eval()
    for m in tmod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    x = torch.randn(1, in_chs, 11, 17)  # odd dims exercise SAME padding
    ref = tmod(x).detach().numpy()

    sd = {k2: v.detach().numpy() for k2, v in tmod.state_dict().items()}
    m = _Mapper(sd)
    m.conv("b/conv_pw", "conv_pw", _conv2d, bias=False)
    m.bn("b/bn1", "bn1")
    m.conv("b/conv_dw", "conv_dw", _conv2d, bias=False)
    m.bn("b/bn2", "bn2")
    m.conv("b/se/conv_reduce", "se.conv_reduce", _conv2d)
    m.conv("b/se/conv_expand", "se.conv_expand", _conv2d)
    m.conv("b/conv_pwl", "conv_pwl", _conv2d, bias=False)
    m.bn("b/bn3", "bn3")
    assert not m.missing
    params = _nest(m.params)["b"]
    stats = _nest(m.stats)["b"]

    fmod = MBConv(out_chs, 6, stride, k)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    out = fmod.apply({"params": params, "batch_stats": stats}, xj,
                     train=False)
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


class TorchUpSampleBN(nn.Module):
    """AdaBins UpSampleBN oracle (unet2d.py:24-46)."""

    def __init__(self, skip_input, out_f):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(skip_input, out_f, 3, 1, 1), nn.BatchNorm2d(out_f),
            nn.LeakyReLU(),
            nn.Conv2d(out_f, out_f, 3, 1, 1), nn.BatchNorm2d(out_f),
            nn.LeakyReLU(),
        )

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                           align_corners=True)
        return self.net(torch.cat([up, skip], dim=1))


def test_upsample_bn_parity(rng):
    from occdepth_tpu.models.unet2d import UpSampleBN

    torch.manual_seed(2)
    tmod = TorchUpSampleBN(12 + 5, 8).eval()
    for m in tmod.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5

    x = torch.randn(1, 12, 6, 9)
    skip = torch.randn(1, 5, 13, 19)
    ref = tmod(x, skip).detach().numpy()

    sd = {k: v.detach().numpy() for k, v in tmod.state_dict().items()}
    m = _Mapper(sd)
    m.conv("u/conv0", "net.0", _conv2d)
    m.bn("u/bn0", "net.1")
    m.conv("u/conv1", "net.3", _conv2d)
    m.bn("u/bn1", "net.4")
    assert not m.missing
    fmod = UpSampleBN(8)
    out = fmod.apply(
        {"params": _nest(m.params)["u"], "batch_stats": _nest(m.stats)["u"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(skip.numpy().transpose(0, 2, 3, 1)),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )
