"""Parity: cascade segmentation head and CRP module vs torch oracles."""
import numpy as np
import torch
import torch.nn as nn

import jax.numpy as jnp

from occdepth_tpu.training.convert_torch import (
    _conv3d,
    _map_crp,
    _map_seg_head,
    _Mapper,
    _nest,
)


def _randomize_bn(mod):
    for m in mod.modules():
        if isinstance(m, (nn.BatchNorm3d,)):
            m.running_mean.data = torch.randn_like(m.running_mean) * 0.1
            m.running_var.data = torch.rand_like(m.running_var) + 0.5
            m.weight.data = torch.randn_like(m.weight) * 0.2 + 1
            m.bias.data = torch.randn_like(m.bias) * 0.1


class TorchCascadeHead(nn.Module):
    """SegmentationHeadCascadeCLS oracle (modules.py:109-175)."""

    def __init__(self, planes, n_classes, dils=(1, 2, 3)):
        super().__init__()
        self.conv0 = nn.Conv3d(planes, planes, 3, padding=1)
        self.conv1 = nn.ModuleList([
            nn.Conv3d(planes, planes, 3, padding=d, dilation=d, bias=False)
            for d in dils
        ])
        self.bn1 = nn.ModuleList([nn.BatchNorm3d(planes) for _ in dils])
        self.conv2 = nn.ModuleList([
            nn.Conv3d(planes, planes, 3, padding=d, dilation=d, bias=False)
            for d in dils
        ])
        self.bn2 = nn.ModuleList([nn.BatchNorm3d(planes) for _ in dils])
        self.occ_classes = nn.Conv3d(planes, 2, 3, padding=1)
        self.conv_classes = nn.Conv3d(planes + 2, n_classes, 3, padding=1)

    def forward(self, x):
        x = torch.relu(self.conv0(x))
        y = None
        for c1, b1, c2, b2 in zip(self.conv1, self.bn1, self.conv2, self.bn2):
            h = b2(c2(torch.relu(b1(c1(x)))))
            y = h if y is None else y + h
        x = torch.relu(y + x)
        occ = self.occ_classes(x)
        x = torch.cat([x, torch.softmax(occ, dim=1)], dim=1)
        return self.conv_classes(x), occ


def test_cascade_head_parity(rng):
    from occdepth_tpu.models.unet3d_blocks import SegmentationHead

    torch.manual_seed(3)
    tmod = TorchCascadeHead(8, 5).eval()
    _randomize_bn(tmod)
    x = torch.randn(1, 8, 6, 5, 4)
    ref_ssc, ref_occ = tmod(x)

    sd = {
        "root." + k: v.detach().numpy()
        for k, v in tmod.state_dict().items()
    }
    m = _Mapper(sd)
    _map_seg_head(m, "h", "root", cascade=True)
    assert not m.missing, m.missing[:6]
    params = _nest(m.params)["h"]
    stats = _nest(m.stats)["h"]

    fmod = SegmentationHead(8, 5, (1, 2, 3), cascade_cls=True)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    ssc, occ = fmod.apply({"params": params, "batch_stats": stats}, xj,
                          train=False)
    np.testing.assert_allclose(
        np.asarray(ssc).transpose(0, 4, 1, 2, 3),
        ref_ssc.detach().numpy(), atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(occ).transpose(0, 4, 1, 2, 3),
        ref_occ.detach().numpy(), atol=3e-4,
    )


class TorchCRP(nn.Module):
    """CPMegaVoxels oracle (CRP3D.py:9-97) with the ASPP + Process pieces."""

    def __init__(self, feature, size, n_rel=2, bn_momentum=0.0003):
        super().__init__()
        from tests.test_torch_parity import TorchDDRBottleneck

        self.size = size
        self.n_rel = n_rel
        self.feature = feature
        ctx = feature * 2
        self.flat = size[0] * size[1] * size[2]
        self.flat_ctx = (size[0] // 2) * (size[1] // 2) * (size[2] // 2)
        pad = tuple((s + 1) % 2 for s in size)

        # ASPP (modules.py:6-48)
        dils = (1, 2, 3)
        self.aspp_conv1 = nn.ModuleList([
            nn.Conv3d(feature, feature, 3, padding=d, dilation=d, bias=False)
            for d in dils
        ])
        self.aspp_bn1 = nn.ModuleList([nn.BatchNorm3d(feature) for _ in dils])
        self.aspp_conv2 = nn.ModuleList([
            nn.Conv3d(feature, feature, 3, padding=d, dilation=d, bias=False)
            for d in dils
        ])
        self.aspp_bn2 = nn.ModuleList([nn.BatchNorm3d(feature) for _ in dils])

        self.mega_context = nn.Conv3d(feature, ctx, 3, stride=2, padding=pad)
        self.context_prior_logits = nn.ModuleList([
            nn.Conv3d(feature, self.flat_ctx, 1) for _ in range(n_rel)
        ])
        self.resize_conv = nn.Conv3d(ctx * n_rel + feature, feature, 1,
                                     bias=False)
        self.resize_block = TorchDDRBottleneck(
            feature, feature // 4, dilation=(1, 1, 1),
            bn_momentum=bn_momentum,
        )

    def forward(self, x):
        y = None
        for c1, b1, c2, b2 in zip(self.aspp_conv1, self.aspp_bn1,
                                  self.aspp_conv2, self.aspp_bn2):
            h = b2(c2(torch.relu(b1(c1(x)))))
            y = h if y is None else y + h
        x_agg = torch.relu(y + x)

        B = x.shape[0]
        mega = self.mega_context(x_agg).reshape(B, self.feature * 2, -1)
        mega = mega.permute(0, 2, 1)
        logits, rels = [], []
        for conv in self.context_prior_logits:
            lg = conv(x_agg).reshape(B, self.flat_ctx, self.flat)
            logits.append(lg.unsqueeze(1))
            pr = torch.sigmoid(lg.permute(0, 2, 1))
            rels.append(torch.bmm(pr, mega))
        ctx = torch.cat(rels, dim=2).permute(0, 2, 1).reshape(
            B, -1, *self.size
        )
        h = torch.cat([x, ctx], dim=1)
        h = self.resize_block(self.resize_conv(h))
        return h, torch.cat(logits, dim=1)


def test_crp_parity(rng):
    from occdepth_tpu.models.crp3d import CPMegaVoxels

    torch.manual_seed(4)
    size = (4, 4, 2)
    tmod = TorchCRP(8, size, n_rel=2).eval()
    _randomize_bn(tmod)
    x = torch.randn(1, 8, *size)
    ref_x, ref_logits = tmod(x)

    sd = {}
    for k, v in tmod.state_dict().items():
        k = (k.replace("aspp_conv1", "aspp.conv1")
              .replace("aspp_bn1", "aspp.bn1")
              .replace("aspp_conv2", "aspp.conv2")
              .replace("aspp_bn2", "aspp.bn2")
              .replace("mega_context", "mega_context.0")
              .replace("context_prior_logits.0.", "context_prior_logits.0.0.")
              .replace("context_prior_logits.1.", "context_prior_logits.1.0.")
              .replace("resize_conv", "resize.0")
              .replace("resize_block", "resize.1.main.0"))
        sd[k] = v.detach().numpy()
    sd3 = {"root." + k: v for k, v in sd.items()}
    m = _Mapper(sd3)
    _map_crp(m, "crp", "root", n_relations=2)
    assert not m.missing, m.missing[:6]
    params = _nest(m.params)["crp"]
    stats = _nest(m.stats)["crp"]

    fmod = CPMegaVoxels(8, size, n_relations=2)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1))
    out = fmod.apply({"params": params, "batch_stats": stats}, xj,
                     train=False)
    np.testing.assert_allclose(
        np.asarray(out["x"]).transpose(0, 4, 1, 2, 3),
        ref_x.detach().numpy(), atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["P_logits"]), ref_logits.detach().numpy(), atol=3e-4
    )
