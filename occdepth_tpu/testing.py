"""Reduced-size configs for tests, compile checks, and multi-chip dry runs."""
from __future__ import annotations

import dataclasses

from occdepth_tpu.config import FlospDepthConfig, OccDepthConfig

TINY_IMG_KITTI = (64, 96)
TINY_IMG_NYU = (64, 80)


def tiny_kitti_config(**overrides) -> OccDepthConfig:
    """KITTI stereo flosp_depth + CRP + cascade at toy sizes."""
    fd = FlospDepthConfig(
        x_bound=(0.0, 6.4, 0.2),
        y_bound=(-3.2, 3.2, 0.2),
        z_bound=(-1.6, 1.6, 0.2),
        d_bound=(2.0, 10.0, 0.5),
        final_dim=TINY_IMG_KITTI,
        mid_channels=16,
    )
    base = dict(
        dataset="kitti",
        full_scene_size=(32, 32, 16),
        project_scale=2,
        scene_size_m=(6.4, 6.4, 3.2),
        voxel_size_m=0.2,
        img_shape_hw=TINY_IMG_KITTI,
        feature=16,
        feature_2d_oc=16,
        n_classes=20,
        frustum_size=2,
        use_stereo_depth_gt=True,
        multi_view_mode=True,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp_depth",
        flosp_depth_override=fd,
        compute_dtype="float32",
        backbone_2d_name="tf_efficientnet_b3_ns",
    )
    base.update(overrides)
    return OccDepthConfig(**base)


def tiny_tartanair_config(**overrides) -> OccDepthConfig:
    """TartanAir stereo flosp + CRP + cascade at toy sizes."""
    base = dict(
        dataset="tartanair",
        full_scene_size=(16, 8, 16),
        project_scale=1,
        scene_size_m=(4.8, 2.4, 4.8),
        voxel_size_m=0.3,
        img_shape_hw=TINY_IMG_KITTI,
        feature=16,
        feature_2d_oc=16,
        n_classes=14,
        frustum_size=2,
        multi_view_mode=True,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp",
        project_1_8=False,
        compute_dtype="float32",
    )
    base.update(overrides)
    return OccDepthConfig(**base)


def tiny_nyu_config(**overrides) -> OccDepthConfig:
    """NYU RGB-D flosp (virtual stereo) + CRP + cascade at toy sizes."""
    base = dict(
        dataset="NYU",
        full_scene_size=(16, 8, 16),  # (X, Z_up, Y) like (60, 36, 60)
        project_scale=1,
        scene_size_m=(4.8, 4.8, 2.4),
        voxel_size_m=0.3,
        img_shape_hw=TINY_IMG_NYU,
        feature=16,
        feature_2d_oc=16,
        n_classes=12,
        n_relations=4,
        frustum_size=2,
        use_depth_gt=True,
        multi_view_mode=False,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp",
        project_1_8=False,
        compute_dtype="float32",
    )
    base.update(overrides)
    return OccDepthConfig(**base)
