"""Full-network torch oracle of the reference OccDepth forward semantics.

Every module here mirrors a reference module (occdepth/models/...) *with the
reference's state_dict key naming*, so `convert_state_dict` can map the
oracle's weights onto the flax tree with zero key remapping — exactly the
path a released checkpoint would take.  Composes the per-module oracles the
other parity tests use into one network:

  * TorchEfficientNet / TorchUNet2D  — unet2d.py:24-255 + gen-efficientnet
  * SFA lifting                      — SFA.py:12-106 (functional, no params)
  * TorchFlospDepth / TorchDepthNet  — flosp_depth/flosp_depth.py:201-608
  * TorchFrustumGridGenerator        — f2v/frustum_grid_generator.py:8-152
  * TorchUNet3DKitti (+CRP, heads)   — unet3d_kitti.py, modules.py, CRP3D.py

kornia note: the reference builds its voxel grid with kornia-0.5.0
`create_meshgrid3d(depth=X, height=Z, width=Y)` + `permute(0,1,3,2,4)`
(frustum_grid_generator.py:32-42), which yields grid[0, ix, iy, iz] ==
(ix, iy, iz) — the geometrically-correct voxel-index field this code
inherits from CaDDN.  kornia isn't installed here, so the oracle constructs
that field directly and replicates kornia's `transform_points` /
`convert_points_from_homogeneous` semantics (1/w scale only where
|w| > 1e-8, else 1.0) in plain torch.
"""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F

from occdepth_tpu.models.efficientnet import B0_STAGES, variant_channels

# ---------------------------------------------------------------------------
# 2D backbone (gen-efficientnet tf_*_ns semantics, torch.hub naming)
# ---------------------------------------------------------------------------


def tf_same_pad(x, k, s):
    """TF-SAME asymmetric padding (extra on bottom/right)."""
    ih, iw = x.shape[-2:]
    pad_h = max((math.ceil(ih / s) - 1) * s + k - ih, 0)
    pad_w = max((math.ceil(iw / s) - 1) * s + k - iw, 0)
    return F.pad(
        x, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2)
    )


class _SE(nn.Module):
    def __init__(self, chs, reduced):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, reduced, 1)
        self.conv_expand = nn.Conv2d(reduced, chs, 1)

    def forward(self, x):
        se = x.mean((2, 3), keepdim=True)
        se = self.conv_expand(F.silu(self.conv_reduce(se)))
        return x * torch.sigmoid(se)


class _DSBlock(nn.Module):
    """DepthwiseSeparableConv (stage-0, expand==1)."""

    def __init__(self, in_chs, out_chs, k):
        super().__init__()
        bn = lambda c: nn.BatchNorm2d(c, eps=1e-3)
        self.conv_dw = nn.Conv2d(in_chs, in_chs, k, 1, groups=in_chs,
                                 bias=False)
        self.bn1 = bn(in_chs)
        self.se = _SE(in_chs, max(1, int(in_chs * 0.25)))
        self.conv_pw = nn.Conv2d(in_chs, out_chs, 1, bias=False)
        self.bn2 = bn(out_chs)
        self.k = k
        self.has_skip = in_chs == out_chs

    def forward(self, x):
        sc = x
        h = F.silu(self.bn1(self.conv_dw(tf_same_pad(x, self.k, 1))))
        h = self.se(h)
        h = self.bn2(self.conv_pw(h))
        return h + sc if self.has_skip else h


class _MBBlock(nn.Module):
    """InvertedResidual (expand>1)."""

    def __init__(self, in_chs, out_chs, expand, k, stride):
        super().__init__()
        mid = in_chs * expand
        bn = lambda c: nn.BatchNorm2d(c, eps=1e-3)
        self.conv_pw = nn.Conv2d(in_chs, mid, 1, bias=False)
        self.bn1 = bn(mid)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, groups=mid, bias=False)
        self.bn2 = bn(mid)
        self.se = _SE(mid, max(1, int(in_chs * 0.25)))
        self.conv_pwl = nn.Conv2d(mid, out_chs, 1, bias=False)
        self.bn3 = bn(out_chs)
        self.k, self.stride = k, stride
        self.has_skip = stride == 1 and in_chs == out_chs

    def forward(self, x):
        sc = x
        h = F.silu(self.bn1(self.conv_pw(x)))
        h = tf_same_pad(h, self.k, self.stride)
        h = F.silu(self.bn2(self.conv_dw(h)))
        h = self.se(h)
        h = self.bn3(self.conv_pwl(h))
        return h + sc if self.has_skip else h


class TorchEfficientNet(nn.Module):
    """gen-efficientnet trunk; returns the UNet2D feature taps.

    state_dict keys: conv_stem / bn1 / blocks.{si}.{bi}.* / conv_head —
    the torch.hub model tree the converter's `_map_efficientnet` expects.
    Feature taps mirror Encoder.forward (unet2d.py:188-196): input,
    stage0..2, stage4, conv_head output (features[0,4,5,6,8,11]).
    """

    def __init__(self, variant):
        super().__init__()
        cfg = variant_channels(variant)
        self.conv_stem = nn.Conv2d(3, cfg["stem"], 3, 2, bias=False)
        self.bn1 = nn.BatchNorm2d(cfg["stem"], eps=1e-3)
        blocks = []
        in_chs = cfg["stem"]
        for si, (expand, _, _, stride, kernel) in enumerate(B0_STAGES):
            out_chs = cfg["stages"][si]
            stage = []
            for bi in range(cfg["repeats"][si]):
                s = stride if bi == 0 else 1
                if expand == 1:
                    stage.append(_DSBlock(in_chs, out_chs, kernel))
                else:
                    stage.append(_MBBlock(in_chs, out_chs, expand, kernel, s))
                in_chs = out_chs
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)
        self.conv_head = nn.Conv2d(in_chs, cfg["head"], 1, bias=False)

    def forward(self, x):
        taps = [x]
        h = F.silu(self.bn1(self.conv_stem(tf_same_pad(x, 3, 2))))
        stage_outs = []
        for stage in self.blocks:
            h = stage(h)
            stage_outs.append(h)
        head = self.conv_head(h)
        return (taps[0], stage_outs[0], stage_outs[1], stage_outs[2],
                stage_outs[4], head)


class TorchUpSampleBN(nn.Module):
    """UpSampleBN with the reference's `_net` naming (unet2d.py:24-46)."""

    def __init__(self, skip_input, out_f):
        super().__init__()
        self._net = nn.Sequential(
            nn.Conv2d(skip_input, out_f, 3, 1, 1), nn.BatchNorm2d(out_f),
            nn.LeakyReLU(),
            nn.Conv2d(out_f, out_f, 3, 1, 1), nn.BatchNorm2d(out_f),
            nn.LeakyReLU(),
        )

    def forward(self, x, skip):
        up = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                           align_corners=True)
        return self._net(torch.cat([up, skip], dim=1))


class TorchDecoderBN(nn.Module):
    """DecoderBN (unet2d.py:51-182), incl. the padded-1x1 conv2 quirk."""

    def __init__(self, variant, out_feature, return_up_feats=1):
        super().__init__()
        cfg = variant_channels(variant)
        # MODEL_CHANNELS[variant] == [3, stage0, stage1, stage2, stage4]
        mc = [3, cfg["stages"][0], cfg["stages"][1], cfg["stages"][2],
              cfg["stages"][4]]
        features = cfg["head"]
        self.return_up_feats = r = return_up_feats
        self.conv2 = nn.Conv2d(features, features, 1, 1, padding=1)
        if r <= 16:
            self.up16 = TorchUpSampleBN(features + mc[4], features // 2)
            self.resize_output_1_16 = nn.Conv2d(features // 2, out_feature, 1)
        if r <= 8:
            self.up8 = TorchUpSampleBN(features // 2 + mc[3], features // 4)
            self.resize_output_1_8 = nn.Conv2d(features // 4, out_feature, 1)
        if r <= 4:
            self.up4 = TorchUpSampleBN(features // 4 + mc[2], features // 8)
            self.resize_output_1_4 = nn.Conv2d(features // 8, out_feature, 1)
        if r <= 2:
            self.up2 = TorchUpSampleBN(features // 8 + mc[1], features // 16)
            self.resize_output_1_2 = nn.Conv2d(features // 16, out_feature, 1)
        if r <= 1:
            self.up1 = TorchUpSampleBN(features // 16 + mc[0], features // 32)
            self.resize_output_1_1 = nn.Conv2d(features // 32, out_feature, 1)

    def forward(self, taps):
        x_in, b0, b1, b2, b4, head = taps
        x = self.conv2(head)
        res = {}
        r = self.return_up_feats
        if r <= 16:
            x = self.up16(x, b4)
            res["1_16"] = self.resize_output_1_16(x)
        if r <= 8:
            x = self.up8(x, b2)
            res["1_8"] = self.resize_output_1_8(x)
        if r <= 4:
            x = self.up4(x, b1)
            res["1_4"] = self.resize_output_1_4(x)
        if r <= 2:
            x = self.up2(x, b0)
            res["1_2"] = self.resize_output_1_2(x)
        if r <= 1:
            x = self.up1(x, x_in)
            res["1_1"] = self.resize_output_1_1(x)
        return res


class TorchEncoderWrap(nn.Module):
    def __init__(self, variant):
        super().__init__()
        self.original_model = TorchEfficientNet(variant)

    def forward(self, x):
        return self.original_model(x)


class TorchUNet2D(nn.Module):
    def __init__(self, variant, out_feature, return_up_feats=1):
        super().__init__()
        self.encoder = TorchEncoderWrap(variant)
        self.decoder = TorchDecoderBN(variant, out_feature, return_up_feats)

    def forward(self, x):
        return self.decoder(self.encoder(x))


# ---------------------------------------------------------------------------
# 3D decoder blocks (modules.py / DDR.py / CRP3D.py naming)
# ---------------------------------------------------------------------------


class TorchBottleneck3D(nn.Module):
    """DDR Bottleneck3D (DDR.py:10-139) with reference key naming."""

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


class TorchProcess(nn.Module):
    """Process (modules.py:252-268): self.main = Sequential of bottlenecks."""

    def __init__(self, feature, bn_momentum, dilations=(1, 2, 3)):
        super().__init__()
        self.main = nn.Sequential(*[
            TorchBottleneck3D(feature, feature // 4, dilation=(i, i, i),
                              bn_momentum=bn_momentum)
            for i in dilations
        ])

    def forward(self, x):
        return self.main(x)


class TorchDownsample(nn.Module):
    """Downsample (modules.py:316-340)."""

    def __init__(self, feature, bn_momentum, expansion=8):
        super().__init__()
        self.main = TorchBottleneck3D(
            feature, feature // 4, stride=2, expansion=expansion,
            with_projection=True, bn_momentum=bn_momentum,
        )

    def forward(self, x):
        return self.main(x)


class TorchUpsample3D(nn.Module):
    """Upsample (modules.py:271-291): ConvT3d s2 + BN + ReLU."""

    def __init__(self, in_channels, out_channels, bn_momentum):
        super().__init__()
        self.main = nn.Sequential(
            nn.ConvTranspose3d(in_channels, out_channels, 3, 2, padding=1,
                               output_padding=1),
            nn.BatchNorm3d(out_channels, momentum=bn_momentum),
            nn.ReLU(),
        )

    def forward(self, x):
        return self.main(x)


class TorchASPP(nn.Module):
    """ASPP 3D (modules.py:6-49)."""

    def __init__(self, planes, dils=(1, 2, 3)):
        super().__init__()
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

    def forward(self, x):
        y = None
        for c1, b1, c2, b2 in zip(self.conv1, self.bn1, self.conv2, self.bn2):
            h = b2(c2(torch.relu(b1(c1(x)))))
            y = h if y is None else y + h
        return torch.relu(y + x)


class TorchCPMegaVoxels(nn.Module):
    """CPMegaVoxels (CRP3D.py:9-97) with native naming."""

    def __init__(self, feature, size, n_relations=4, bn_momentum=0.0003):
        super().__init__()
        self.size = size
        self.n_relations = n_relations
        self.feature = feature
        self.context_feature = feature * 2
        self.flatten_size = size[0] * size[1] * size[2]
        self.flatten_context_size = (size[0] // 2) * (size[1] // 2) * (
            size[2] // 2)
        padding = tuple((s + 1) % 2 for s in size)
        self.mega_context = nn.Sequential(
            nn.Conv3d(feature, self.context_feature, 3, stride=2,
                      padding=padding)
        )
        self.context_prior_logits = nn.ModuleList([
            nn.Sequential(nn.Conv3d(feature, self.flatten_context_size, 1))
            for _ in range(n_relations)
        ])
        self.aspp = TorchASPP(feature)
        self.resize = nn.Sequential(
            nn.Conv3d(self.context_feature * n_relations + feature, feature,
                      1, bias=False),
            TorchProcess(feature, bn_momentum, dilations=(1,)),
        )

    def forward(self, x):
        bs = x.shape[0]
        x_agg = self.aspp(x)
        mega = self.mega_context(x_agg).reshape(bs, self.context_feature, -1)
        mega = mega.permute(0, 2, 1)
        logits, rels = [], []
        for conv in self.context_prior_logits:
            lg = conv(x_agg).reshape(
                bs, self.flatten_context_size, self.flatten_size
            )
            logits.append(lg.unsqueeze(1))
            rels.append(torch.bmm(torch.sigmoid(lg.permute(0, 2, 1)), mega))
        ctx = torch.cat(rels, dim=2).permute(0, 2, 1).reshape(
            bs, -1, *self.size
        )
        h = self.resize(torch.cat([x, ctx], dim=1))
        return {"x": h, "P_logits": torch.cat(logits, dim=1)}


class TorchSegHeadCascade(nn.Module):
    """SegmentationHeadCascadeCLS (modules.py:109-175); with cascade=False
    the plain SegmentationHead (modules.py:51-106) — no occupancy branch,
    as in the released non-cascade NYU config."""

    def __init__(self, planes, n_classes, dils=(1, 2, 3), cascade=True):
        super().__init__()
        self.cascade = cascade
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
        if cascade:
            self.occ_classes = nn.Conv3d(planes, 2, 3, padding=1)
            self.conv_classes = nn.Conv3d(planes + 2, n_classes, 3, padding=1)
        else:
            self.conv_classes = nn.Conv3d(planes, n_classes, 3, padding=1)

    def forward(self, x):
        x = torch.relu(self.conv0(x))
        y = None
        for c1, b1, c2, b2 in zip(self.conv1, self.bn1, self.conv2, self.bn2):
            h = b2(c2(torch.relu(b1(c1(x)))))
            y = h if y is None else y + h
        x = torch.relu(y + x)
        if not self.cascade:
            return self.conv_classes(x), None
        occ = self.occ_classes(x)
        x = torch.cat([x, torch.softmax(occ, dim=1)], dim=1)
        return self.conv_classes(x), occ


class TorchSegHeadOccluded(nn.Module):
    """SegmentationHeadOccludedCLS (modules.py:178-235)."""

    def __init__(self, planes, dils=(1, 2, 3)):
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

    def forward(self, x):
        x = torch.relu(self.conv0(x))
        y = None
        for c1, b1, c2, b2 in zip(self.conv1, self.bn1, self.conv2, self.bn2):
            h = b2(c2(torch.relu(b1(c1(x)))))
            y = h if y is None else y + h
        x = torch.relu(y + x)
        return self.occ_classes(x)


class TorchUNet3DKitti(nn.Module):
    """UNet3D KITTI (unet3d_kitti.py:14-126) with reference naming."""

    def __init__(self, n_classes, feature, context_prior=True, n_relations=4,
                 size_l3=(4, 4, 2), bn_momentum=0.1, occluded_cls=False):
        super().__init__()
        self.process_l1 = nn.Sequential(
            TorchProcess(feature, bn_momentum),
            TorchDownsample(feature, bn_momentum),
        )
        self.process_l2 = nn.Sequential(
            TorchProcess(feature * 2, bn_momentum),
            TorchDownsample(feature * 2, bn_momentum),
        )
        self.up_13_l2 = TorchUpsample3D(feature * 4, feature * 2, bn_momentum)
        self.up_12_l1 = TorchUpsample3D(feature * 2, feature, bn_momentum)
        self.up_l1_lfull = TorchUpsample3D(feature, feature // 2, bn_momentum)
        self.ssc_head = TorchSegHeadCascade(feature // 2, n_classes)
        self.context_prior = context_prior
        if context_prior:
            self.CP_mega_voxels = TorchCPMegaVoxels(
                feature * 4, size_l3, n_relations=n_relations,
                bn_momentum=bn_momentum,
            )
        self.occluded_cls = occluded_cls
        if occluded_cls:
            self.occluded_head = TorchSegHeadOccluded(feature // 2)

    def forward(self, x3d_l1):
        res = {}
        x3d_l2 = self.process_l1(x3d_l1)
        x3d_l3 = self.process_l2(x3d_l2)
        if self.context_prior:
            ret = self.CP_mega_voxels(x3d_l3)
            x3d_l3 = ret["x"]
            res.update(ret)
        x3d_up_l2 = self.up_13_l2(x3d_l3) + x3d_l2
        x3d_up_l1 = self.up_12_l1(x3d_up_l2) + x3d_l1
        x3d_up_lfull = self.up_l1_lfull(x3d_up_l1)
        ssc_logit, occ_logit = self.ssc_head(x3d_up_lfull)
        res["ssc_logit"] = ssc_logit
        res["occ_logit"] = occ_logit
        if self.occluded_cls:
            res["occluded_logit"] = self.occluded_head(x3d_up_lfull)
        return res


# ---------------------------------------------------------------------------
# FlospDepth / OAD branch (flosp_depth.py + f2v)
# ---------------------------------------------------------------------------


def _dehom(points, eps=1e-8):
    """kornia convert_points_from_homogeneous: 1/w only where |w| > eps."""
    w = points[..., -1:]
    scale = torch.where(torch.abs(w) > eps, 1.0 / w, torch.ones_like(w))
    return scale * points[..., :-1]


def _transform_points(trans, points):
    """kornia transform_points: hom -> matmul -> dehom."""
    ones = torch.ones_like(points[..., :1])
    ph = torch.cat([points, ones], dim=-1)
    out = (trans @ ph.unsqueeze(-1)).squeeze(-1)
    return _dehom(out)


def torch_bin_depths(depth_map, mode, depth_min, depth_max, num_bins):
    """f2v/utils/depth_utils.py:5-43 (continuous indices, target=False)."""
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        return (depth_map - depth_min) / bin_size
    if mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        return -0.5 + 0.5 * torch.sqrt(
            1 + 8 * (depth_map - depth_min) / bin_size
        )
    if mode == "SID":
        return (
            num_bins
            * (torch.log(1 + depth_map) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    raise NotImplementedError(mode)


class TorchFrustumGridGenerator(nn.Module):
    """FrustumGridGenerator (f2v/frustum_grid_generator.py:8-152)."""

    def __init__(self, grid_size, pc_range, disc_cfg, final_dim):
        super().__init__()
        self.grid_size = grid_size  # (X, Y, Z)
        self.disc_cfg = disc_cfg
        self.final_dim = final_dim  # (H, W)
        pc = torch.tensor(pc_range, dtype=torch.float32).reshape(2, 3)
        self.pc_min = pc[0]
        self.voxel_size = (pc[1] - pc[0]) / torch.tensor(
            grid_size, dtype=torch.float32
        )
        X, Y, Z = grid_size
        ix, iy, iz = torch.meshgrid(
            torch.arange(X, dtype=torch.float32),
            torch.arange(Y, dtype=torch.float32),
            torch.arange(Z, dtype=torch.float32),
        )
        # kornia create_meshgrid3d + XZY->XYZ permute + 0.5 (see module doc)
        self.voxel_grid = torch.stack([ix, iy, iz], dim=-1) + 0.5  # (X,Y,Z,3)
        self.grid_to_lidar = torch.tensor(
            [
                [self.voxel_size[0], 0, 0, self.pc_min[0]],
                [0, self.voxel_size[1], 0, self.pc_min[1]],
                [0, 0, self.voxel_size[2], self.pc_min[2]],
                [0, 0, 0, 1],
            ],
            dtype=torch.float32,
        )

    def forward(self, lidar_to_cam, cam_to_img, ida_mats):
        """(B,4,4), (B,3,4), (B,4,4) -> (B, X, Y, Z, 3) normalized grid."""
        B = lidar_to_cam.shape[0]
        trans = (lidar_to_cam @ self.grid_to_lidar).reshape(B, 1, 1, 1, 4, 4)
        voxel_grid = self.voxel_grid.unsqueeze(0).expand(B, -1, -1, -1, -1)
        camera_grid = _transform_points(trans, voxel_grid)

        # project_to_image (transform_utils.py:5-26)
        proj = cam_to_img.reshape(B, 1, 1, 1, 3, 4)
        ph = torch.cat(
            [camera_grid, torch.ones_like(camera_grid[..., :1])], dim=-1
        )
        pt = (proj @ ph.unsqueeze(-1)).squeeze(-1)
        image_grid = _dehom(pt)
        image_depths = pt[..., -1] - proj[..., 2, 3]

        image_depths = torch_bin_depths(image_depths, **self.disc_cfg)
        frustum_grid = torch.cat(
            [image_grid, image_depths.unsqueeze(-1)], dim=-1
        )
        frustum_grid = _transform_points(
            ida_mats.reshape(B, 1, 1, 1, 4, 4), frustum_grid
        )

        # normalize_coords with shape (num_bins, H, W) flipped -> (W, H, D)
        H, W = self.final_dim
        denom = torch.tensor(
            [W - 1, H - 1, self.disc_cfg["num_bins"] - 1],
            dtype=torch.float32,
        )
        frustum_grid = frustum_grid / denom * 2.0 - 1.0
        frustum_grid[~torch.isfinite(frustum_grid)] = -2.0
        return frustum_grid


class TorchBasicBlock(nn.Module):
    """mmdet ResNet BasicBlock (two conv-BN, identity skip)."""

    def __init__(self, channels):
        super().__init__()
        self.conv1 = nn.Conv2d(channels, channels, 3, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(channels)
        self.conv2 = nn.Conv2d(channels, channels, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(channels)

    def forward(self, x):
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + x)


class TorchMlp(nn.Module):
    def __init__(self, in_f, hidden, out_f):
        super().__init__()
        self.fc1 = nn.Linear(in_f, hidden)
        self.fc2 = nn.Linear(hidden, out_f)

    def forward(self, x):
        return self.fc2(torch.relu(self.fc1(x)))


class TorchSELayerFD(nn.Module):
    """flosp_depth SELayer (flosp_depth.py:186-198)."""

    def __init__(self, channels):
        super().__init__()
        self.conv_reduce = nn.Conv2d(channels, channels, 1)
        self.conv_expand = nn.Conv2d(channels, channels, 1)

    def forward(self, x, x_se):
        x_se = self.conv_expand(torch.relu(self.conv_reduce(x_se)))
        return x * torch.sigmoid(x_se)


class TorchDepthNet(nn.Module):
    """DepthNet (flosp_depth.py:201-257)."""

    def __init__(self, in_channels, mid_channels, depth_channels):
        super().__init__()
        self.reduce_conv = nn.Sequential(
            nn.Conv2d(in_channels, mid_channels, 3, 1, 1),
            nn.BatchNorm2d(mid_channels),
            nn.ReLU(inplace=True),
        )
        self.mlp = TorchMlp(1, mid_channels, mid_channels)
        self.se = TorchSELayerFD(mid_channels)
        self.depth_conv = nn.Sequential(
            TorchBasicBlock(mid_channels),
            TorchBasicBlock(mid_channels),
            TorchBasicBlock(mid_channels),
        )
        self.depth_pred = nn.Conv2d(mid_channels, depth_channels, 1)

    def forward(self, x, sweep_intrins):
        inv = torch.inverse(sweep_intrins)
        pixel_size = torch.norm(
            torch.stack([inv[..., 0, 0], inv[..., 1, 1]], dim=-1), dim=-1
        ).reshape(-1, 1)
        scaled_pixel_size = pixel_size * 1000.0
        x = self.reduce_conv(x)
        x_se = self.mlp(scaled_pixel_size)[..., None, None]
        x = self.se(x, x_se)
        x = self.depth_conv(x)
        return self.depth_pred(x)


class TorchFlospDepth(nn.Module):
    """FlospDepth (flosp_depth.py:324-608) for the KITTI static-bounds path."""

    def __init__(self, conf, project_scale, in_channels, return_depth):
        super().__init__()
        self.conf = conf
        self.return_depth = return_depth
        depth_channels = int(
            (conf.d_bound[1] - conf.d_bound[0]) / conf.d_bound[2]
        )
        self.depth_net = nn.Sequential(
            TorchDepthNet(in_channels, conf.mid_channels, depth_channels)
        )
        grid_size = tuple(
            int((row[1] - row[0]) / row[2] / project_scale)
            for row in (conf.x_bound, conf.y_bound, conf.z_bound)
        )
        pc_range = [
            conf.x_bound[0], conf.y_bound[0], conf.z_bound[0],
            conf.x_bound[1], conf.y_bound[1], conf.z_bound[1],
        ]
        self.grid_generator = TorchFrustumGridGenerator(
            grid_size, pc_range,
            {
                "mode": conf.disc_mode,
                "num_bins": depth_channels,
                "depth_min": conf.d_bound[0],
                "depth_max": conf.d_bound[1],
            },
            conf.final_dim,
        )

    def forward(self, img_feat, cam_k, T_velo_2_cam, ida_mats):
        """img_feat (B, V, C, h, w); calib tensors (B, V, ...)."""
        bs, n_cams, c, h, w = img_feat.shape
        flat = img_feat.reshape(bs * n_cams, c, h, w)
        intrins_mat = cam_k.new_zeros(bs, n_cams, 4, 4)
        intrins_mat[:, :, :3, :3] = cam_k
        intrins_mat[:, :, 3, 3] = 1
        depth_logits = self.depth_net[0](flat, intrins_mat)
        depth = depth_logits.softmax(1)
        depth = depth.unsqueeze(1).reshape(
            bs, n_cams, 1, depth.shape[1], depth.shape[2], depth.shape[3]
        )
        feats, masks = [], []
        for i in range(n_cams):
            grid = self.grid_generator(
                T_velo_2_cam[:, i], intrins_mat[:, i, :3, :], ida_mats[:, i]
            )
            feats.append(F.grid_sample(depth[:, i], grid,
                                       mode="bilinear", padding_mode="zeros"))
            if n_cams > 1:
                masks.append(
                    F.grid_sample(torch.ones_like(depth[:, i]), grid,
                                  mode="bilinear", padding_mode="zeros")
                )
        if n_cams == 1:
            agg = feats[0]
        else:
            agg = sum(feats)
            m = sum(masks)
            agg[m > 0] = agg[m > 0] / m[m > 0]
        if self.return_depth:
            return agg, depth.squeeze(2)
        return agg


# ---------------------------------------------------------------------------
# SFA lifting (functional; SFA.py:12-106)
# ---------------------------------------------------------------------------


def torch_sfa(x2d, projected_pix, fov_mask, scene_dims, dataset):
    """One sample, one scale: (V, C, h, w) + (V, N, P, 2) -> (C, X, Y, Z).

    Replicates SFA.forward: zero-sentinel gather, pattern mean, NaN->0,
    pairwise cosine fusion, dataset reshape.
    """
    n_views, c, h, w = x2d.shape
    feats, weights = [], []
    for v in range(n_views):
        src = x2d[v].reshape(c, -1)
        src = torch.cat([src, torch.zeros(c, 1, dtype=src.dtype)], dim=1)
        pix_x = projected_pix[v, :, :, 0]
        pix_y = projected_pix[v, :, :, 1]
        idx = pix_y * w + pix_x
        m = fov_mask[v]
        wts = torch.where(m, torch.ones_like(idx), torch.zeros_like(idx))
        idx = torch.where(m, idx, torch.full_like(idx, h * w)).long()
        gathered = None
        for k in range(idx.shape[1]):
            g = torch.gather(src, 1, idx[:, k].expand(c, -1))
            gathered = g if gathered is None else gathered + g
        cnt = wts.sum(1)
        f = gathered / cnt
        f = torch.where(torch.isnan(f), torch.zeros_like(f), f)
        mv = cnt / cnt
        mv = torch.where(torch.isnan(mv), torch.zeros_like(mv), mv)
        feats.append(f)
        weights.append(mv)
    if n_views == 1:
        fused = feats[0]
    else:
        fused = torch.zeros_like(feats[0])
        for i in range(n_views):
            for j in range(i + 1, n_views):
                wij = weights[i] * weights[j]
                cos = torch.cosine_similarity(feats[i], feats[j], 0) * wij
                wi = cos + (weights[i] - weights[j] > 0).float()
                wj = cos + (weights[j] - weights[i] > 0).float()
                fused = fused + wi * feats[i] + wj * feats[j]
        fused = fused / (n_views * (n_views - 1))
    X, Y, Z = scene_dims
    if dataset == "NYU":
        x3d = fused.reshape(c, X, Z, Y).permute(0, 1, 3, 2)
    else:
        x3d = fused.reshape(c, X, Y, Z)
    return x3d


# ---------------------------------------------------------------------------
# Full network (OccDepth.py:208-376 semantics)
# ---------------------------------------------------------------------------


class TorchOccDepth(nn.Module):
    """Whole-network oracle for the KITTI stereo flosp_depth+CRP+cascade
    config — the flagship path (OccDepth.forward, OccDepth.py:344-376)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.net_rgb = TorchUNet2D(
            cfg.backbone_2d_name, cfg.feature_2d_oc, cfg.return_up_feats
        )
        size_l3 = tuple(s // cfg.project_scale // 4
                        for s in cfg.full_scene_size)
        self.net_3d_decoder = TorchUNet3DKitti(
            cfg.n_classes, cfg.feature, context_prior=cfg.context_prior,
            n_relations=cfg.n_relations, size_l3=size_l3,
            occluded_cls=cfg.occluded_cls,
        )
        if cfg.trans_2d_to_3d == "flosp_depth":
            self.flosp_depth = TorchFlospDepth(
                cfg.flosp_depth_conf, cfg.project_scale, cfg.feature,
                return_depth=cfg.with_depth_gt,
            )

    def forward(self, img, projected_pix, fov_mask, cam_k, T_velo_2_cam,
                ida_mats):
        """img (B, V, 3, H, W); calib (B, V, ...); pix (B, V, N, P, 2)."""
        cfg = self.cfg
        B, V = img.shape[:2]
        x_rgb = [self.net_rgb(img[:, v]) for v in range(V)]
        if getattr(cfg, "share_2d_backbone_gradient", False):
            # reference: views > 0 run under torch.no_grad
            # (OccDepth.py:213-216); detaching the outputs is gradient-
            # equivalent and keeps this oracle usable for grad parity
            x_rgb = [x_rgb[0]] + [
                {k: t.detach() for k, t in f.items()} for f in x_rgb[1:]
            ]

        scene_dims = tuple(s // cfg.project_scale
                           for s in cfg.full_scene_size)
        x3ds = []
        for i in range(B):
            x3d = None
            for scale in cfg.project_res:
                x2d = torch.stack(
                    [x_rgb[v][f"1_{scale}"][i] for v in range(V)]
                )
                pix = torch.div(
                    projected_pix[i], scale, rounding_mode="floor"
                ) if scale > 1 else projected_pix[i]
                lifted = torch_sfa(
                    x2d, pix, fov_mask[i], scene_dims, cfg.dataset
                )
                x3d = lifted if x3d is None else x3d + lifted
            x3ds.append(x3d)
        x3ds = torch.stack(x3ds)  # (B, C, X, Y, Z)

        out = {}
        if cfg.trans_2d_to_3d == "flosp_depth":
            key = f"1_{cfg.flosp_depth_conf.downsample_factor}"
            img_feat = torch.stack([x_rgb[v][key] for v in range(V)], dim=1)
            if cfg.with_depth_gt:
                x3ds_depth, depth_pred = self.flosp_depth(
                    img_feat, cam_k, T_velo_2_cam, ida_mats
                )
                out["depth_pred"] = depth_pred
            else:
                x3ds_depth = self.flosp_depth(
                    img_feat, cam_k, T_velo_2_cam, ida_mats
                )
            x3ds = x3ds * x3ds_depth * 100

        out.update(self.net_3d_decoder(x3ds))
        return out


def randomize_bn(mod, seed=0):
    """Give every BN non-trivial running stats so parity pins stat handling."""
    g = torch.Generator().manual_seed(seed)
    for m in mod.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.running_mean.data = torch.randn(
                m.running_mean.shape, generator=g) * 0.1
            m.running_var.data = torch.rand(
                m.running_var.shape, generator=g) + 0.5
            m.weight.data = torch.randn(
                m.weight.shape, generator=g) * 0.2 + 1.0
            m.bias.data = torch.randn(m.bias.shape, generator=g) * 0.1


class TorchUNet3DNYU(nn.Module):
    """UNet3D NYU (unet3d_nyu.py:16-110) with reference naming."""

    def __init__(self, n_classes, feature, full_scene_size,
                 context_prior=True, n_relations=4, bn_momentum=0.1,
                 cascade_cls=True):
        super().__init__()
        self.process_1_4 = nn.Sequential(
            TorchProcess(feature, bn_momentum),
            TorchDownsample(feature, bn_momentum),
        )
        self.process_1_8 = nn.Sequential(
            TorchProcess(feature * 2, bn_momentum),
            TorchDownsample(feature * 2, bn_momentum),
        )
        self.up_1_16_1_8 = TorchUpsample3D(feature * 4, feature * 2,
                                           bn_momentum)
        self.up_1_8_1_4 = TorchUpsample3D(feature * 2, feature, bn_momentum)
        self.ssc_head_1_4 = TorchSegHeadCascade(feature, n_classes,
                                                cascade=cascade_cls)
        self.context_prior = context_prior
        if context_prior:
            size_1_16 = tuple(-(-s // 4) for s in full_scene_size)
            self.CP_mega_voxels = TorchCPMegaVoxels(
                feature * 4, size_1_16, n_relations=n_relations,
                bn_momentum=bn_momentum,
            )

    def forward(self, x3d_1_4):
        res = {}
        x3d_1_8 = self.process_1_4(x3d_1_4)
        x3d_1_16 = self.process_1_8(x3d_1_8)
        if self.context_prior:
            ret = self.CP_mega_voxels(x3d_1_16)
            x3d_1_16 = ret["x"]
            res.update(ret)
        x3d_up_1_8 = self.up_1_16_1_8(x3d_1_16) + x3d_1_8
        x3d_up_1_4 = self.up_1_8_1_4(x3d_up_1_8) + x3d_1_4
        ssc_logit, occ_logit = self.ssc_head_1_4(x3d_up_1_4)
        res["ssc_logit"] = ssc_logit
        if occ_logit is not None:
            res["occ_logit"] = occ_logit
        return res


def torch_virtual_view(x_scale, depth_mat, scale_2d, bf):
    """Virtual right-view warp (OccDepth.generate_virtual_img semantics,
    OccDepth.py:233-260): bilinear-resized disparity, `arange(-1, 1, 2/n)`
    grid (NOT grid_sample centres), sample 0's disparity broadcast over the
    batch, border padding."""
    n_bs, c, h, w = x_scale.shape
    depth_scale = nn.functional.interpolate(
        depth_mat, size=(h, w), mode="bilinear", align_corners=False
    )
    grid_dx = (bf / int(scale_2d)) / depth_scale
    grid_dx = torch.where(
        torch.isinf(grid_dx), torch.zeros_like(grid_dx), grid_dx
    ) * (2.0 / w)
    h_d = torch.arange(-1, 1, 2 / h)
    w_d = torch.arange(-1, 1, 2 / w)
    meshx, meshy = torch.meshgrid((h_d, w_d))
    grid = torch.stack(
        [torch.stack((meshy, meshx), dim=2)] * n_bs
    ).type_as(grid_dx)
    grid[:, :, :, 0] = grid[:, :, :, 0] + grid_dx[0, 0]
    return nn.functional.grid_sample(
        x_scale, grid, mode="bilinear", padding_mode="border",
        align_corners=False,
    )


class TorchOccDepthNYU(nn.Module):
    """Whole-network oracle for the NYU RGB-D flosp+CRP+cascade config
    (virtual stereo path, OccDepth.py:222-260 + 344-376)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.net_rgb = TorchUNet2D(
            cfg.backbone_2d_name, cfg.feature_2d_oc, cfg.return_up_feats
        )
        self.net_3d_decoder = TorchUNet3DNYU(
            cfg.n_classes, cfg.feature, cfg.full_scene_size,
            context_prior=cfg.context_prior, n_relations=cfg.n_relations,
            cascade_cls=cfg.cascade_cls,
        )

    def forward(self, img, projected_pix, fov_mask, gt_depth, virtual_bf):
        """img (B, 1, 3, H, W); pix/fov include the virtual view (B, 2, ...)."""
        cfg = self.cfg
        B = img.shape[0]
        left = self.net_rgb(img[:, 0])
        virt = {
            f"1_{s}": torch_virtual_view(
                left[f"1_{s}"], gt_depth, s, virtual_bf
            )
            for s in cfg.project_res
        }
        x_rgb = [left, virt]

        scene_dims = tuple(s // cfg.project_scale
                           for s in cfg.full_scene_size)
        x3ds = []
        for i in range(B):
            x3d = None
            for scale in cfg.project_res:
                x2d = torch.stack(
                    [x_rgb[v][f"1_{scale}"][i] for v in range(2)]
                )
                pix = torch.div(
                    projected_pix[i], scale, rounding_mode="floor"
                ) if scale > 1 else projected_pix[i]
                lifted = torch_sfa(x2d, pix, fov_mask[i], scene_dims, "NYU")
                x3d = lifted if x3d is None else x3d + lifted
            x3ds.append(x3d)
        return self.net_3d_decoder(torch.stack(x3ds))
