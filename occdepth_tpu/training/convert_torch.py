"""Convert a reference PyTorch checkpoint into occdepth_tpu flax variables.

The reference ships Lightning .ckpt files whose state_dict keys follow the
module tree of occdepth/models/OccDepth.py.  This module maps that tree
onto our flax parameter tree (channels-last kernels) so the released
checkpoints can be evaluated for output parity.

Weight layout transforms:
    Conv2d   (O, I, kh, kw)       -> (kh, kw, I, O)
    Conv3d   (O, I, kd, kh, kw)   -> (kd, kh, kw, I, O)
    ConvT3d  (I, O, kd, kh, kw)   -> (kd, kh, kw, O, I)   [transpose_kernel]
    Linear   (O, I)               -> (I, O)
    BatchNorm weight/bias         -> scale/bias; running stats -> batch_stats
"""
from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.models.efficientnet import B0_STAGES, variant_channels


def _conv2d(w):
    return np.transpose(w, (2, 3, 1, 0))


def _conv3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _convT3d(w):
    return np.transpose(w, (2, 3, 4, 1, 0))


def _linear(w):
    return np.transpose(w)


class _Mapper:
    """Accumulates (flax_path -> value) for params and batch_stats."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: Dict[Tuple[str, ...], np.ndarray] = {}
        self.stats: Dict[Tuple[str, ...], np.ndarray] = {}
        self.missing: List[str] = []

    def _get(self, key):
        if key not in self.sd:
            self.missing.append(key)
            return None
        return self.sd[key]

    def conv(self, fpath: str, tkey: str, transform, bias: bool = True):
        w = self._get(tkey + ".weight")
        if w is not None:
            self.params[tuple(fpath.split("/")) + ("kernel",)] = transform(w)
        if bias:
            b = self._get(tkey + ".bias")
            if b is not None:
                self.params[tuple(fpath.split("/")) + ("bias",)] = b

    def dense(self, fpath: str, tkey: str):
        w = self._get(tkey + ".weight")
        if w is not None:
            self.params[tuple(fpath.split("/")) + ("kernel",)] = _linear(w)
        b = self._get(tkey + ".bias")
        if b is not None:
            self.params[tuple(fpath.split("/")) + ("bias",)] = b

    def bn(self, fpath: str, tkey: str):
        """Maps onto our BatchNorm wrapper: <fpath>/BatchNorm_0/{scale,bias}."""
        base = tuple(fpath.split("/")) + ("BatchNorm_0",)
        w = self._get(tkey + ".weight")
        if w is not None:
            self.params[base + ("scale",)] = w
        b = self._get(tkey + ".bias")
        if b is not None:
            self.params[base + ("bias",)] = b
        m = self._get(tkey + ".running_mean")
        if m is not None:
            self.stats[base + ("mean",)] = m
        v = self._get(tkey + ".running_var")
        if v is not None:
            self.stats[base + ("var",)] = v

    def raw_bn(self, fpath: str, tkey: str):
        """BN implemented directly with flax nn.BatchNorm (efficientnet)."""
        base = tuple(fpath.split("/")) + ("BatchNorm_0",)
        self.bn(fpath, tkey)


def _map_bottleneck3d(m: _Mapper, fpath: str, tkey: str, stride: int = 1,
                      has_downsample: bool = False):
    """DDR Bottleneck3D (reference DDR.py:35-139)."""
    for i in range(1, 6):
        m.conv(f"{fpath}/conv{i}", f"{tkey}.conv{i}", _conv3d, bias=False)
        m.bn(f"{fpath}/bn{i}", f"{tkey}.bn{i}")
    if stride != 1:
        for d in (2, 3, 4):
            m.conv(f"{fpath}/downsample{d}_conv", f"{tkey}.downsample{d}.1",
                   _conv3d, bias=False)
            m.bn(f"{fpath}/downsample{d}_bn", f"{tkey}.downsample{d}.2")
    if has_downsample:
        m.conv(f"{fpath}/downsample_conv", f"{tkey}.downsample.1", _conv3d,
               bias=False)
        m.bn(f"{fpath}/downsample_bn", f"{tkey}.downsample.2")


def _map_process(m: _Mapper, fpath: str, tkey: str, n_blocks: int):
    for i in range(n_blocks):
        _map_bottleneck3d(m, f"{fpath}/block{i}", f"{tkey}.main.{i}")


def _map_upsample(m: _Mapper, fpath: str, tkey: str):
    m.conv(f"{fpath}/conv", f"{tkey}.main.0", _convT3d)
    m.bn(f"{fpath}/bn", f"{tkey}.main.1")


def _map_aspp_block(m: _Mapper, fpath: str, tkey: str, n_dil: int = 3):
    for i in range(n_dil):
        m.conv(f"{fpath}/conv1_{i}", f"{tkey}.conv1.{i}", _conv3d, bias=False)
        m.bn(f"{fpath}/bn1_{i}", f"{tkey}.bn1.{i}")
        m.conv(f"{fpath}/conv2_{i}", f"{tkey}.conv2.{i}", _conv3d, bias=False)
        m.bn(f"{fpath}/bn2_{i}", f"{tkey}.bn2.{i}")


def _map_seg_head(m: _Mapper, fpath: str, tkey: str, cascade: bool,
                  occluded: bool = False):
    m.conv(f"{fpath}/conv0", f"{tkey}.conv0", _conv3d)
    _map_aspp_block(m, fpath, tkey)
    if occluded:
        m.conv(f"{fpath}/occ_classes", f"{tkey}.occ_classes", _conv3d)
        return
    if cascade:
        m.conv(f"{fpath}/occ_classes", f"{tkey}.occ_classes", _conv3d)
    m.conv(f"{fpath}/conv_classes", f"{tkey}.conv_classes", _conv3d)


def _map_efficientnet(m: _Mapper, fpath: str, tkey: str, variant: str):
    cfg = variant_channels(variant)
    m.conv(f"{fpath}/conv_stem", f"{tkey}.conv_stem", _conv2d, bias=False)
    m.raw_bn(f"{fpath}/bn1", f"{tkey}.bn1")
    for si, (expand, _, _, _, _) in enumerate(B0_STAGES):
        for bi in range(cfg["repeats"][si]):
            fb = f"{fpath}/blocks_{si}_{bi}"
            tb = f"{tkey}.blocks.{si}.{bi}"
            if expand == 1:
                m.conv(f"{fb}/conv_dw", f"{tb}.conv_dw", _conv2d, bias=False)
                m.raw_bn(f"{fb}/bn1", f"{tb}.bn1")
                m.conv(f"{fb}/se/conv_reduce", f"{tb}.se.conv_reduce", _conv2d)
                m.conv(f"{fb}/se/conv_expand", f"{tb}.se.conv_expand", _conv2d)
                m.conv(f"{fb}/conv_pw", f"{tb}.conv_pw", _conv2d, bias=False)
                m.raw_bn(f"{fb}/bn2", f"{tb}.bn2")
            else:
                m.conv(f"{fb}/conv_pw", f"{tb}.conv_pw", _conv2d, bias=False)
                m.raw_bn(f"{fb}/bn1", f"{tb}.bn1")
                m.conv(f"{fb}/conv_dw", f"{tb}.conv_dw", _conv2d, bias=False)
                m.raw_bn(f"{fb}/bn2", f"{tb}.bn2")
                m.conv(f"{fb}/se/conv_reduce", f"{tb}.se.conv_reduce", _conv2d)
                m.conv(f"{fb}/se/conv_expand", f"{tb}.se.conv_expand", _conv2d)
                m.conv(f"{fb}/conv_pwl", f"{tb}.conv_pwl", _conv2d, bias=False)
                m.raw_bn(f"{fb}/bn3", f"{tb}.bn3")
    m.conv(f"{fpath}/conv_head", f"{tkey}.conv_head", _conv2d, bias=False)


def _map_unet2d(m: _Mapper, cfg: OccDepthConfig):
    _map_efficientnet(m, "net_rgb/encoder", "net_rgb.encoder.original_model",
                      cfg.backbone_2d_name)
    m.conv("net_rgb/conv2", "net_rgb.decoder.conv2", _conv2d)
    scales = [16, 8, 4, 2, 1]
    r = cfg.return_up_feats
    for s in scales:
        if r <= s:
            m.conv(f"net_rgb/up{s}/conv0", f"net_rgb.decoder.up{s}._net.0",
                   _conv2d)
            m.bn(f"net_rgb/up{s}/bn0", f"net_rgb.decoder.up{s}._net.1")
            m.conv(f"net_rgb/up{s}/conv1", f"net_rgb.decoder.up{s}._net.3",
                   _conv2d)
            m.bn(f"net_rgb/up{s}/bn1", f"net_rgb.decoder.up{s}._net.4")
            m.conv(f"net_rgb/resize_output_1_{s}",
                   f"net_rgb.decoder.resize_output_1_{s}", _conv2d)


def _map_crp(m: _Mapper, fpath: str, tkey: str, n_relations: int):
    _map_aspp_block(m, f"{fpath}/aspp", f"{tkey}.aspp")
    m.conv(f"{fpath}/mega_context", f"{tkey}.mega_context.0", _conv3d)
    for r in range(n_relations):
        m.conv(f"{fpath}/context_prior_logits_{r}",
               f"{tkey}.context_prior_logits.{r}.0", _conv3d)
    m.conv(f"{fpath}/resize_conv", f"{tkey}.resize.0", _conv3d, bias=False)
    _map_process(m, f"{fpath}/resize_process", f"{tkey}.resize.1", 1)


def _map_unet3d(m: _Mapper, cfg: OccDepthConfig):
    f = "net_3d_decoder"
    t = "net_3d_decoder"
    if cfg.dataset == "NYU":
        p1, p2 = "process_1_4", "process_1_8"
        u1, u2 = "up_1_16_1_8", "up_1_8_1_4"
        head = "ssc_head_1_4"
    else:
        p1, p2 = "process_l1", "process_l2"
        u1, u2 = "up_13_l2", "up_12_l1"
        head = "ssc_head"
    _map_process(m, f"{f}/process_l1", f"{t}.{p1}.0", 3)
    _map_bottleneck3d(m, f"{f}/down_l1/main", f"{t}.{p1}.1.main", stride=2,
                      has_downsample=True)
    _map_process(m, f"{f}/process_l2", f"{t}.{p2}.0", 3)
    _map_bottleneck3d(m, f"{f}/down_l2/main", f"{t}.{p2}.1.main", stride=2,
                      has_downsample=True)
    if cfg.context_prior:
        _map_crp(m, f"{f}/cp_mega_voxels", f"{t}.CP_mega_voxels",
                 cfg.n_relations)
    _map_upsample(m, f"{f}/up_13_l2", f"{t}.{u1}")
    _map_upsample(m, f"{f}/up_12_l1", f"{t}.{u2}")
    if cfg.dataset != "NYU":
        _map_upsample(m, f"{f}/up_l1_lfull", f"{t}.up_l1_lfull")
    _map_seg_head(m, f"{f}/ssc_head", f"{t}.{head}", cfg.cascade_cls)
    if cfg.occluded_cls:
        _map_seg_head(m, f"{f}/occluded_head", f"{t}.occluded_head",
                      cascade=False, occluded=True)


def _map_flosp_depth(m: _Mapper, cfg: OccDepthConfig):
    f = "flosp_depth/depth_net"
    t = "flosp_depth.depth_net.0"
    m.conv(f"{f}/reduce_conv", f"{t}.reduce_conv.0", _conv2d)
    m.bn(f"{f}/reduce_bn", f"{t}.reduce_conv.1")
    m.dense(f"{f}/mlp_fc1", f"{t}.mlp.fc1")
    m.dense(f"{f}/mlp_fc2", f"{t}.mlp.fc2")
    m.conv(f"{f}/se_reduce", f"{t}.se.conv_reduce", _conv2d)
    m.conv(f"{f}/se_expand", f"{t}.se.conv_expand", _conv2d)
    for i in range(3):
        m.conv(f"{f}/depth_conv_{i}/conv1", f"{t}.depth_conv.{i}.conv1",
               _conv2d, bias=False)
        m.bn(f"{f}/depth_conv_{i}/bn1", f"{t}.depth_conv.{i}.bn1")
        m.conv(f"{f}/depth_conv_{i}/conv2", f"{t}.depth_conv.{i}.conv2",
               _conv2d, bias=False)
        m.bn(f"{f}/depth_conv_{i}/bn2", f"{t}.depth_conv.{i}.bn2")
    m.conv(f"{f}/depth_pred", f"{t}.depth_pred", _conv2d)


def _nest(flat: Dict[Tuple[str, ...], np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value
    return tree


def convert_state_dict(
    sd: Dict[str, np.ndarray], cfg: OccDepthConfig
) -> Tuple[Dict[str, Any], Dict[str, Any], List[str]]:
    """torch state_dict -> (params, batch_stats, missing_keys)."""
    # strip Lightning's "model." prefix if present
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}
    m = _Mapper(sd)
    _map_unet2d(m, cfg)
    _map_unet3d(m, cfg)
    if cfg.trans_2d_to_3d == "flosp_depth":
        _map_flosp_depth(m, cfg)
    return _nest(m.params), _nest(m.stats), m.missing


def load_torch_checkpoint(path: str, cfg: OccDepthConfig):
    """Load a Lightning .ckpt / plain .pt state_dict into flax variables."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    params, stats, missing = convert_state_dict(sd, cfg)
    return {"params": params, "batch_stats": stats}, missing


def load_torch_into_state(state, path: str, cfg: OccDepthConfig):
    """Replace a TrainState's params/batch_stats with a converted torch
    checkpoint — the released-checkpoint path shared by the eval /
    generate_output / submission / infer CLIs (reference
    scripts/eval.py:65-70 `load_from_checkpoint`)."""
    import jax
    import jax.numpy as jnp

    variables, missing = load_torch_checkpoint(path, cfg)
    if missing:
        print(f"WARNING: {len(missing)} torch keys not found, e.g. "
              f"{missing[:5]}")
    return state.replace(
        params=jax.tree_util.tree_map(jnp.asarray, variables["params"]),
        batch_stats=jax.tree_util.tree_map(
            jnp.asarray, variables["batch_stats"]
        ),
    )
