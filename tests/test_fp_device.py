"""On-device fp-loss mask generation must reproduce the host path exactly.

The production step no longer ships (F, X, Y, Z) masks from the host
(~134 MB/sample at flagship config); it rebuilds them in-graph from calib
(losses/fp_device.py).  These tests pin:
  * compute_frustum_class_dists == compute_local_frustums histograms,
  * frustum_proportion_loss_device == frustum_proportion_loss fed the
    host-computed masks, on geometry-consistent synthetic batches.
"""
import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from occdepth_tpu.data.batch import (
    default_extrinsics,
    default_intrinsics,
    make_synthetic_batch,
    vox_origin_for,
)
from occdepth_tpu.geometry.frustums_mask import (
    compute_frustum_class_dists,
    compute_local_frustums,
)
from occdepth_tpu.geometry.projection import vox2pix
from occdepth_tpu.losses.fp_device import frustum_proportion_loss_device
from occdepth_tpu.losses.ssc import frustum_proportion_loss
from occdepth_tpu.testing import tiny_kitti_config, tiny_nyu_config


@pytest.mark.parametrize("dataset", ["kitti", "NYU"])
def test_class_dists_match_mask_path(dataset, rng):
    cfg = tiny_kitti_config() if dataset == "kitti" else tiny_nyu_config()
    H, W = cfg.img_shape
    vox_origin = vox_origin_for(cfg)
    cam_k = default_intrinsics(cfg)

    pix, pz = [], []
    for v in range(2):
        p, _, z = vox2pix(
            default_extrinsics(cfg, v), cam_k, vox_origin,
            cfg.voxel_size_meters * cfg.output_scale, W, H,
            cfg.scene_size_meters, cfg.pattern_id,
        )
        pix.append(p)
        pz.append(z)
    pix = np.stack(pix)
    pz = np.stack(pz).astype(np.float32)

    X, Y, Z = cfg.full_scene_size
    target = rng.randint(0, cfg.n_classes, size=(X, Y, Z)).astype(np.int32)
    target[rng.rand(X, Y, Z) > 0.8] = 255

    _, ref_dists = compute_local_frustums(
        pix, pz, target, W, H, dataset, cfg.n_classes, cfg.frustum_size
    )
    dists = compute_frustum_class_dists(
        pix, pz, target, W, H, dataset, cfg.n_classes, cfg.frustum_size
    )
    np.testing.assert_array_equal(dists, ref_dists)


def _host_masks_for_batch(cfg, batch):
    """Host-path masks per sample, from the same geometry the device uses."""
    H, W = cfg.img_shape
    vox_origin = vox_origin_for(cfg)
    cam_k = default_intrinsics(cfg)
    exts = [default_extrinsics(cfg, v) for v in range(cfg.n_views)]
    if cfg.dataset == "NYU" and cfg.use_depth_gt:
        from occdepth_tpu.data.nyu import VIRTUAL_BASELINE

        shift = np.eye(4)
        shift[0, 3] = -VIRTUAL_BASELINE
        exts.append(shift @ exts[0])
    pix, pz = [], []
    for T in exts:
        p, _, z = vox2pix(
            T, cam_k, vox_origin, cfg.voxel_size_meters * cfg.output_scale,
            W, H, cfg.scene_size_meters, cfg.pattern_id,
        )
        pix.append(p)
        pz.append(z)
    pix = np.stack(pix)
    pz = np.stack(pz).astype(np.float32)
    masks = np.stack([
        compute_local_frustums(
            pix, pz, t, W, H, cfg.dataset, cfg.n_classes, cfg.frustum_size
        )[0]
        for t in batch["target"]
    ])
    return masks


@pytest.mark.parametrize("maker", [tiny_kitti_config, tiny_nyu_config])
def test_fp_loss_device_matches_host_masks(maker, rng):
    cfg = maker()
    batch = make_synthetic_batch(cfg, batch_size=2, seed=13)
    assert "frustums_masks" not in batch  # masks no longer shipped

    X, Y, Z = cfg.full_scene_size
    logits = rng.randn(2, X, Y, Z, cfg.n_classes).astype(np.float32)

    masks = _host_masks_for_batch(cfg, batch)
    ref = frustum_proportion_loss(
        jnp.asarray(logits), jnp.asarray(masks),
        jnp.asarray(batch["frustums_class_dists"]),
    )
    got = frustum_proportion_loss_device(
        cfg, jnp.asarray(logits),
        {k: jnp.asarray(v) for k, v in batch.items()},
    )
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5, atol=1e-6)
