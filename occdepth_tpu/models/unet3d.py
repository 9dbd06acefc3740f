"""3D UNet decoders (KITTI and NYU variants).

References: occdepth/models/unet3d_kitti.py:14-126 and unet3d_nyu.py:16-110.
Both share the Process->Downsample encoder and transposed-conv decoder with
additive skips; KITTI adds a final upsample to the full 256x256x32 grid and
optional occluded head.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from occdepth_tpu.models.crp3d import CPMegaVoxels
from occdepth_tpu.models.unet3d_blocks import (
    Convblock3d,
    Downsample,
    Process,
    SegmentationHead,
    Upsample,
)
from occdepth_tpu.ops.layout_pin import pin_grid


def _head_cls(remat: bool):
    """SegmentationHead, optionally rematerialized: the head chain holds
    ~10 full-scene-grid activations for its backward (conv inputs + ASPP
    intermediates at (256,256,32,16) = ~67 MB each); jax.checkpoint
    recomputes them from the head input instead, trading cheap recompute
    (the step is ~93% HBM-bound, docs/DESIGN.md) for the store+load
    traffic of those tensors.  Parameter pytree is unchanged."""
    return nn.remat(SegmentationHead, static_argnums=(2,)) if remat \
        else SegmentationHead


class UNet3DKitti(nn.Module):
    """KITTI 3D decoder (unet3d_kitti.py)."""

    n_classes: int
    feature: int
    full_scene_size: Tuple[int, int, int]
    project_scale: int = 2
    context_prior: bool = True
    n_relations: int = 4
    cascade_cls: bool = True
    occluded_cls: bool = False
    bn_momentum: float = 0.1
    use_pallas: bool = False
    layout_pin: str = "off"  # full-grid layout experiment (ops/layout_pin)
    remat_heads: bool = False  # recompute head chain in backward
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x3d, train: bool = False) -> Dict[str, jnp.ndarray]:
        f = self.feature
        res: Dict[str, jnp.ndarray] = {}
        x3d = pin_grid(x3d, self.layout_pin)

        x3d_l1 = x3d
        h = Process(f, (1, 2, 3), self.bn_momentum, dtype=self.dtype,
                    name="process_l1")(x3d_l1, train)
        x3d_l2 = Downsample(f, bn_momentum=self.bn_momentum, dtype=self.dtype,
                            name="down_l1")(h, train)
        h = Process(f * 2, (1, 2, 3), self.bn_momentum, dtype=self.dtype,
                    name="process_l2")(x3d_l2, train)
        x3d_l3 = Downsample(f * 2, bn_momentum=self.bn_momentum, dtype=self.dtype,
                            name="down_l2")(h, train)

        if self.context_prior:
            size_l3 = tuple(
                s // self.project_scale // 4 for s in self.full_scene_size
            )
            ret = CPMegaVoxels(
                f * 4, size_l3, n_relations=self.n_relations,
                bn_momentum=self.bn_momentum, use_pallas=self.use_pallas,
                dtype=self.dtype, name="cp_mega_voxels",
            )(x3d_l3, train)
            x3d_l3 = ret["x"]
            res["P_logits"] = ret["P_logits"]

        x3d_up_l2 = Upsample(f * 2, self.bn_momentum, dtype=self.dtype,
                             name="up_13_l2")(x3d_l3, train) + x3d_l2
        x3d_up_l1 = pin_grid(
            Upsample(f, self.bn_momentum, dtype=self.dtype,
                     name="up_12_l1")(x3d_up_l2, train) + x3d_l1,
            self.layout_pin,
        )
        if self.project_scale == 1:
            x3d_full = Convblock3d(f // 2, self.bn_momentum, dtype=self.dtype,
                                   name="up_l1_lfull")(x3d_up_l1, train)
        else:
            x3d_full = Upsample(f // 2, self.bn_momentum, dtype=self.dtype,
                                name="up_l1_lfull")(x3d_up_l1, train)
        x3d_full = pin_grid(x3d_full, self.layout_pin)

        res["x3d_l1"] = x3d_up_l1
        res["x3d_l2"] = x3d_up_l2
        res["x3d_l3"] = x3d_l3

        head_cls = _head_cls(self.remat_heads and train)
        if self.cascade_cls:
            ssc, occ = head_cls(
                f // 2, self.n_classes, (1, 2, 3), cascade_cls=True,
                layout_pin=self.layout_pin, dtype=self.dtype, name="ssc_head",
            )(x3d_full, train)
            res["ssc_logit"] = pin_grid(ssc, self.layout_pin)
            res["occ_logit"] = occ
        else:
            res["ssc_logit"] = head_cls(
                f // 2, self.n_classes, (1, 2, 3),
                layout_pin=self.layout_pin, dtype=self.dtype, name="ssc_head",
            )(x3d_full, train)

        if self.occluded_cls:
            res["occluded_logit"] = head_cls(
                f // 2, self.n_classes, (1, 2, 3), occluded_only=True,
                layout_pin=self.layout_pin, dtype=self.dtype,
                name="occluded_head",
            )(x3d_full, train)
        return res


class UNet3DNYU(nn.Module):
    """NYU 3D decoder (unet3d_nyu.py) — output stays at the input 1:4 scale."""

    n_classes: int
    feature: int
    full_scene_size: Tuple[int, int, int]
    context_prior: bool = True
    n_relations: int = 4
    cascade_cls: bool = True
    bn_momentum: float = 0.1
    use_pallas: bool = False
    remat_heads: bool = False  # recompute head chain in backward
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x3d, train: bool = False) -> Dict[str, jnp.ndarray]:
        f = self.feature
        res: Dict[str, jnp.ndarray] = {}

        x3d_1_4 = x3d
        h = Process(f, (1, 2, 3), self.bn_momentum, dtype=self.dtype,
                    name="process_l1")(x3d_1_4, train)
        x3d_1_8 = Downsample(f, bn_momentum=self.bn_momentum, dtype=self.dtype,
                             name="down_l1")(h, train)
        h = Process(f * 2, (1, 2, 3), self.bn_momentum, dtype=self.dtype,
                    name="process_l2")(x3d_1_8, train)
        x3d_1_16 = Downsample(f * 2, bn_momentum=self.bn_momentum,
                              dtype=self.dtype, name="down_l2")(h, train)

        if self.context_prior:
            size_1_16 = tuple(-(-s // 4) for s in self.full_scene_size)
            ret = CPMegaVoxels(
                f * 4, size_1_16, n_relations=self.n_relations,
                bn_momentum=self.bn_momentum, use_pallas=self.use_pallas,
                dtype=self.dtype, name="cp_mega_voxels",
            )(x3d_1_16, train)
            x3d_1_16 = ret["x"]
            res["P_logits"] = ret["P_logits"]

        x3d_up_1_8 = Upsample(f * 2, self.bn_momentum, dtype=self.dtype,
                              name="up_13_l2")(x3d_1_16, train) + x3d_1_8
        x3d_up_1_4 = Upsample(f, self.bn_momentum, dtype=self.dtype,
                              name="up_12_l1")(x3d_up_1_8, train) + x3d_1_4

        res["x3d_l1"] = x3d_up_1_4
        res["x3d_l2"] = x3d_up_1_8
        res["x3d_l3"] = x3d_1_16

        head_cls = _head_cls(self.remat_heads and train)
        if self.cascade_cls:
            ssc, occ = head_cls(
                f, self.n_classes, (1, 2, 3), cascade_cls=True,
                dtype=self.dtype, name="ssc_head",
            )(x3d_up_1_4, train)
            res["ssc_logit"] = ssc
            res["occ_logit"] = occ
        else:
            res["ssc_logit"] = head_cls(
                f, self.n_classes, (1, 2, 3), dtype=self.dtype, name="ssc_head",
            )(x3d_up_1_4, train)
        return res
