"""Local frustum masks + per-frustum class histograms, vectorized.

Replaces the python double loop over size x size image tiles
(reference: occdepth/data/utils/helpers.py:172-260).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np


def compute_local_frustums(
    projected_pix: np.ndarray,
    pix_z: np.ndarray,
    target: np.ndarray,
    img_W: int,
    img_H: int,
    dataset: str,
    n_classes: int,
    size: int = 4,
) -> Tuple[np.ndarray, np.ndarray]:
    """Compute frustum voxel masks and class histograms for the fp loss.

    Args:
        projected_pix: (V, N, P, 2) per-view pattern pixels; only the centre
            pattern point (P index 0) is used, like the reference
            (helpers.py:228-231).
        pix_z: (V, N) per-view voxel depths.
        target: (H, W, D) voxel labels.
        img_W, img_H: image dims.
        dataset: "kitti" | "NYU" | "tartanair" (controls the N->grid reshape).
        n_classes: histogram size.
        size: tiles per image side; size^2 frustums total.

    Returns:
        frustums_masks: (size^2, H, W, D) bool.
        frustums_class_dists: (size^2, n_classes) float64 counts.
    """
    H, W, D = target.shape
    n_views = projected_pix.shape[0]
    pix_x = projected_pix[:, :, 0, 0].astype(np.float64)  # (V, N)
    pix_y = projected_pix[:, :, 0, 1].astype(np.float64)

    # Tile bounds: x tiles vary fastest within a row of y tiles
    # (reference loops `for y: for x:`, helpers.py:219-224).
    bounds = np.arange(size, dtype=np.float64) / size
    starts_x = (bounds * img_W)[None, :].repeat(size, 0).reshape(-1)  # (T,)
    ends_x = ((bounds + 1.0 / size) * img_W)[None, :].repeat(size, 0).reshape(-1)
    starts_y = (bounds * img_H)[:, None].repeat(size, 1).reshape(-1)
    ends_y = ((bounds + 1.0 / size) * img_H)[:, None].repeat(size, 1).reshape(-1)

    T = size * size
    # (T, V, N) membership, OR over views
    in_tile = (
        (pix_x[None] >= starts_x[:, None, None])
        & (pix_x[None] < ends_x[:, None, None])
        & (pix_y[None] >= starts_y[:, None, None])
        & (pix_y[None] < ends_y[:, None, None])
        & (pix_z[None] > 0)
    )
    local_frustum = in_tile.any(axis=1)  # (T, N)

    if dataset == "NYU":
        # flat (world) voxel order is (ts0, ts2, ts1) of the target layout
        # (NYU target (X, Zup, Y): world (X, Y, Zup), helpers.py:241-244)
        grids = np.moveaxis(
            local_frustum.reshape(T, H, D, W), [1, 2, 3], [1, 3, 2]
        )
    else:
        # kitti AND tartanair: target layout == world order.  The
        # reference's tartanair branch reshapes flat world data to
        # (H, D, W) even though its vox2pix flat order is the target
        # shape itself (helpers.py:245-248 vs tartanair_dataset.py:214-221)
        # — a scrambled-mask bug we do not replicate; our tartanair export
        # writes targets in world (X, Y, Z) order.
        grids = local_frustum.reshape(T, H, W, D)

    valid = target != 255
    masks = valid[None] & grids  # (T, H, W, D)

    flat_target = target.reshape(-1).astype(np.int64)
    flat_masks = masks.reshape(T, -1)
    dists = np.zeros((T, n_classes), dtype=np.float64)
    for t in range(T):  # T is tiny (16 or 64); bincount per tile
        dists[t] = np.bincount(
            flat_target[flat_masks[t]], minlength=n_classes
        )[:n_classes]
    return masks, dists


def world_order_target(target: np.ndarray, dataset: str) -> np.ndarray:
    """Reorder a target volume into flat world voxel order (the vox2pix /
    voxel_centroids (X, Y, Z)-'ij' flattening the projections index).
    kitti/tartanair targets already are world order (see
    compute_local_frustums)."""
    if dataset == "NYU":
        # NYU target (X, Zup, Y) -> world (X, Y, Zup)
        return np.ascontiguousarray(np.transpose(target, (0, 2, 1)))
    return target


def compute_frustum_class_dists(
    projected_pix: np.ndarray,
    pix_z: np.ndarray,
    target: np.ndarray,
    img_W: int,
    img_H: int,
    dataset: str,
    n_classes: int,
    size: int = 4,
) -> np.ndarray:
    """Per-frustum GT class histograms WITHOUT materializing the voxel masks.

    Same values as `compute_local_frustums(...)[1]`, but O(N) via per-voxel
    tile indices instead of the (size^2, N) mask tensor — the masks
    themselves are rebuilt on-device inside the fp loss
    (losses/fp_device.py), so the data pipeline only ships this tiny
    (size^2, n_classes) table.
    """
    # integer arithmetic throughout: pixels are int32 and the tile index
    # floor(p*size/dim) == (p*size)//dim for p >= 0 (negatives are culled
    # by `valid` before use) — float64 passes over (V, 2M) were the
    # loader's hottest host op (bench_loader)
    px = projected_pix[:, :, 0, 0]  # (V, N) int32
    py = projected_pix[:, :, 0, 1]
    V = px.shape[0]
    T = size * size

    from occdepth_tpu import native_ext

    cls_w = world_order_target(target, dataset).reshape(-1)
    native = native_ext.frustum_class_dists(
        px, py, pix_z, cls_w, size, img_W, img_H, n_classes
    )
    if native is not None:
        return native

    ix = (px * size) // img_W
    iy = (py * size) // img_H
    valid = (
        (px >= 0) & (px < img_W) & (py >= 0) & (py < img_H) & (pix_z > 0)
    )
    tile = np.where(valid, iy * size + ix, -1)  # (V, N)

    cls = cls_w.astype(np.int32)  # already world-ordered for the native try
    cls_valid = cls != 255

    dists = np.zeros(T * n_classes, dtype=np.float64)
    for v in range(V):
        new = (tile[v] >= 0) & cls_valid
        for u in range(v):  # OR semantics: count each (voxel, tile) once
            new &= tile[u] != tile[v]
        dists += np.bincount(
            tile[v][new] * n_classes + cls[new], minlength=T * n_classes
        )
    return dists.reshape(T, n_classes)
