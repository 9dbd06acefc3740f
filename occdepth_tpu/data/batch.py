"""Fixed-schema training batches (the TPU replacement for ragged collation).

The reference collates per-sample lists of tensors (calibration, projection
indices; occdepth/data/semantic_kitti/collate.py:62-72).  XLA requires
static shapes, so a batch here is a plain dict of stacked numpy/jnp arrays:

    img:                  (B, V, H, W, 3) float32 (normalized RGB)
    projected_pix:        (B, Vl, N, P, 2) int32 — at project_scale
    fov_mask:             (B, Vl, N, P) bool
    cam_k:                (B, V, 3, 3) float32
    T_velo_2_cam:         (B, V, 4, 4) float32
    ida_mats:             (B, V, 4, 4) float32
    target:               (B, X, Y, Z) int32 (255 = invalid)   [train/val]
    CP_mega_matrices:     (B, n_rel, N8, M8) uint8             [if CRP]
    frustums_class_dists: (B, F, C) float32                    [if fp loss]
        (frustum voxel masks are rebuilt on device in the fp loss —
        losses/fp_device.py — so they never cross the host boundary)
    gt_depth:             (B, Vd, H, W) float32                [if depth sup]
    vox_origin:           (B, 3) float32                       [NYU/tartanair]
    virtual_bf:           (B,) float32                         [NYU]
    occluded:             (B, X, Y, Z) int32                   [if occluded]

`make_synthetic_batch` fabricates a geometrically-consistent batch for
tests, the compile-check entrypoint, and the benchmark.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.geometry.projection import vox2pix


def num_voxels(cfg: OccDepthConfig, scale: Optional[int] = None) -> int:
    s = scale or cfg.project_scale
    if cfg.dataset == "NYU":
        # flat voxel order follows world dims ceil(scene/voxel) = (60, 60, 36)
        dims = [
            int(np.ceil(m / (cfg.voxel_size_meters * s)))
            for m in cfg.scene_size_meters
        ]
        return int(np.prod(dims))
    X, Y, Z = cfg.scene_dims(s)
    return X * Y * Z


def default_intrinsics(cfg: OccDepthConfig) -> np.ndarray:
    """Plausible intrinsics scaled to the configured image size."""
    H, W = cfg.img_shape
    if cfg.img_shape_hw is None:
        if cfg.dataset == "NYU":
            return np.array(
                [[518.8579, 0, 320], [0, 518.8579, 240], [0, 0, 1]]
            )
        return np.array(
            [[707.0912, 0, 601.8873], [0, 707.0912, 183.1104], [0, 0, 1]]
        )
    f = 0.9 * W
    return np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])


def default_extrinsics(cfg: OccDepthConfig, view: int) -> np.ndarray:
    """A plausible world/lidar->cam matrix looking into the scene (+x)."""
    T = np.eye(4)
    # x-forward/y-left/z-up -> cam z-forward/x-right/y-down
    T[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    sz = cfg.scene_size_meters[2]
    T[:3, 3] = [-0.06 - 0.54 * view, sz / 4, -0.27]
    return T


def vox_origin_for(cfg: OccDepthConfig) -> np.ndarray:
    sx, sy, sz = cfg.scene_size_meters
    if cfg.dataset == "kitti":
        if cfg.scene_size_m is None:
            return np.array([0.0, -25.6, -2.0])
        return np.array([0.0, -sy / 2, -sz / 2])
    if cfg.dataset == "NYU":
        return np.array([0.0, -sy / 2, 0.0])
    return np.array([-sx / 2, -sy / 2, -sz / 2])


def make_synthetic_batch(
    cfg: OccDepthConfig,
    batch_size: int = 1,
    seed: int = 0,
    with_labels: bool = True,
    img_shape=None,
) -> Dict[str, np.ndarray]:
    """Random but geometrically-consistent batch matching the schema."""
    rs = np.random.RandomState(seed)
    H, W = img_shape or cfg.img_shape
    V = cfg.n_views
    Vl = cfg.n_lift_views

    cam_k = default_intrinsics(cfg)
    if img_shape is not None:
        # scale intrinsics to the reduced test image
        full_h, full_w = cfg.img_shape
        cam_k = cam_k.copy()
        cam_k[0] *= W / full_w
        cam_k[1] *= H / full_h

    vox_origin = vox_origin_for(cfg)
    pix_list, fov_list = [], []
    for v in range(Vl):
        T = default_extrinsics(cfg, v)
        pp, fm, _ = vox2pix(
            T, cam_k, vox_origin, cfg.voxel_size_meters * cfg.project_scale,
            W, H, cfg.scene_size_meters, cfg.pattern_id,
        )
        pix_list.append(pp)
        fov_list.append(fm)
    projected_pix = np.stack(pix_list).astype(np.int32)
    fov_mask = np.stack(fov_list)

    batch: Dict[str, np.ndarray] = {
        "img": rs.randn(batch_size, V, H, W, 3).astype(np.float32),
        "projected_pix": np.broadcast_to(
            projected_pix, (batch_size,) + projected_pix.shape
        ).copy(),
        "fov_mask": np.broadcast_to(
            fov_mask, (batch_size,) + fov_mask.shape
        ).copy(),
        "cam_k": np.broadcast_to(
            cam_k.astype(np.float32), (batch_size, V, 3, 3)
        ).copy(),
        "T_velo_2_cam": np.stack(
            [
                np.stack([default_extrinsics(cfg, v) for v in range(V)])
                for _ in range(batch_size)
            ]
        ).astype(np.float32),
        "ida_mats": np.broadcast_to(
            np.eye(4, dtype=np.float32), (batch_size, V, 4, 4)
        ).copy(),
    }
    if cfg.dataset in ("NYU", "tartanair"):
        batch["vox_origin"] = np.broadcast_to(
            vox_origin.astype(np.float32), (batch_size, 3)
        ).copy()
    if cfg.dataset == "NYU":
        batch["virtual_bf"] = np.full((batch_size,), 0.1 * 518.8579, np.float32)

    # depth is a model *input* (OAD distillation target and/or the NYU
    # virtual-stereo source), independent of labels
    if cfg.with_depth_gt:
        Vd = 1 if (cfg.use_stereo_depth_gt or cfg.use_depth_gt) else V
        depth = rs.uniform(0.0, 40.0, size=(batch_size, Vd, H, W))
        depth[depth < 2.0] = 0.0
        batch["gt_depth"] = depth.astype(np.float32)

    if with_labels:
        X, Y, Z = cfg.full_scene_size
        batch["target"] = rs.choice(
            np.arange(cfg.n_classes + 1),
            size=(batch_size, X, Y, Z),
            p=_label_probs(cfg.n_classes),
        ).astype(np.int32)
        batch["target"][batch["target"] == cfg.n_classes] = 255
        if cfg.context_prior:
            from occdepth_tpu.geometry.relations import compute_cp_mega_matrix

            # relation GT computed at the scale the CRP sees
            rel_scale = 8 if cfg.dataset == "kitti" else 4
            tgt8 = batch["target"][:, ::rel_scale, ::rel_scale, ::rel_scale]
            batch["CP_mega_matrices"] = np.stack(
                [
                    compute_cp_mega_matrix(t, cfg.n_relations == 2)
                    for t in tgt8
                ]
            )
        if cfg.fp_loss:
            # geometry-consistent histograms at output scale; the voxel
            # masks themselves are rebuilt on device inside the fp loss
            # (losses/fp_device.py) from the same calib matrices
            from occdepth_tpu.geometry.frustums_mask import (
                compute_frustum_class_dists,
            )

            exts = [default_extrinsics(cfg, v) for v in range(V)]
            if cfg.dataset == "NYU" and cfg.use_depth_gt:
                from occdepth_tpu.data.nyu import VIRTUAL_BASELINE

                shift = np.eye(4)
                shift[0, 3] = -VIRTUAL_BASELINE
                exts.append(shift @ exts[0])
            po, zo = [], []
            for T in exts:
                p, _, z = vox2pix(
                    T, cam_k, vox_origin,
                    cfg.voxel_size_meters * cfg.output_scale,
                    W, H, cfg.scene_size_meters, cfg.pattern_id,
                )
                po.append(p)
                zo.append(z)
            pix_o = np.stack(po).astype(np.int64)
            pz_o = np.stack(zo).astype(np.float32)
            dists = np.stack([
                compute_frustum_class_dists(
                    pix_o, pz_o, t, W, H, cfg.dataset,
                    cfg.n_classes, cfg.frustum_size,
                )
                for t in batch["target"]
            ])
            batch["frustums_class_dists"] = dists.astype(np.float32)
        if cfg.occluded_cls:
            batch["occluded"] = (rs.rand(batch_size, X, Y, Z) > 0.5).astype(
                np.int32
            )
    return batch


def _label_probs(n_classes: int) -> np.ndarray:
    p = np.full(n_classes + 1, 0.3 / n_classes)
    p[0] = 0.6  # mostly empty, like real scenes
    p[-1] = 0.1 + (0.3 - p[1:-1].sum() - 0.0)  # 255 share
    p = p / p.sum()
    return p
