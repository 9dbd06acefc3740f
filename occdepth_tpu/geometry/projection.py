"""Voxel-to-pixel projection geometry (host-side, vectorized NumPy).

Replaces the reference's numba hot loops — `TSDFVolume.vox2world`,
`rigid_transform`, `TSDFVolume.cam2allpixs` (reference:
occdepth/data/utils/fusion.py:201-343) and the `vox2pix` wrapper
(occdepth/data/utils/helpers.py:94-169) — with vectorized NumPy that
produces bit-identical index tensors.  These run once per (calibration,
flip) pair in the input pipeline; results are cached and fed to the model
as fixed-shape int32 arrays.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

# DSO-style residual pixel patterns: each voxel centre projects to a small
# pattern of pixels that are gathered and averaged.  Index = `pattern_id`
# config key.  (reference: fusion.py:238-330 `pixel_partern`)
PIXEL_PATTERNS = (
    ((0, 0),),
    ((0, 0), (0, -1), (-1, 0), (1, 0), (0, 1)),
    ((0, 0), (-1, -1), (1, 1), (-1, 1), (1, -1)),
    (
        (0, 0), (-1, -1), (-1, 0), (-1, 1), (-1, 0),
        (0, 1), (1, -1), (1, 0), (1, 1),
    ),
    (
        (0, 0), (0, -2), (-1, -1), (1, -1), (-2, 0),
        (2, 0), (-1, 1), (1, 1), (0, 2),
    ),
    (
        (0, 0), (0, -2), (-1, -1), (1, -1), (-2, 0), (2, 0),
        (-1, 1), (1, 1), (0, 2), (-2, -2), (-2, 2), (2, -2), (2, 2),
    ),
    (
        (0, 0), (-2, -2), (-2, -1), (-2, 0), (-2, 1), (-2, 2),
        (-1, -2), (-1, -1), (-1, 0), (-1, 1), (-1, 2),
        (0, -2), (0, -1), (0, 1), (0, 2),
        (1, -2), (1, -1), (1, 0), (1, 1), (1, 2),
        (2, -2), (2, -1), (2, 0), (2, 1), (2, 2),
    ),
    ((0, 0), (0, -2), (-1, -1), (1, -1), (-2, 0), (2, 0), (-1, 1), (0, 2)),
    (
        (0, 0), (0, -2), (-1, -1), (1, -1), (-2, 0), (2, 0),
        (-1, 1), (1, 1), (0, 2), (-2, -2), (-2, 2), (2, -2), (2, 2),
        (-3, -1), (-3, 1), (3, -1), (3, 1), (1, -3), (-1, -3), (1, 3), (-1, 3),
    ),
)


def voxel_centroids(
    vox_origin: np.ndarray, vol_dim: Tuple[int, int, int], voxel_size: float
) -> np.ndarray:
    """World/lidar coordinates of all voxel centroids, flattened row-major.

    Voxel index order is the row-major flattening of an (X, Y, Z) 'ij'
    meshgrid, matching the reference (helpers.py:137-149 + fusion.py:203-217:
    origin + size * (index + 0.5)).

    Returns (N, 3) float32 with N = prod(vol_dim).
    """
    xv, yv, zv = np.meshgrid(
        np.arange(vol_dim[0]), np.arange(vol_dim[1]), np.arange(vol_dim[2]),
        indexing="ij",
    )
    coords = np.stack(
        [xv.reshape(-1), yv.reshape(-1), zv.reshape(-1)], axis=1
    ).astype(np.float32)
    origin = np.asarray(vox_origin, dtype=np.float32)
    return origin[None, :] + voxel_size * (coords + 0.5)


def rigid_transform(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    """Apply a 4x4 rigid transform to (N, 3) points (fusion.py rigid_transform)."""
    points = np.asarray(points, dtype=np.float32)
    rot = transform[:3, :3].astype(np.float32)
    trans = transform[:3, 3].astype(np.float32)
    return points @ rot.T + trans[None, :]


def project_pattern_pixels(
    cam_pts: np.ndarray, cam_k: np.ndarray, pattern_id: int
) -> np.ndarray:
    """Project camera-frame points to pattern pixel coordinates.

    Matches the numba kernel `cam2allpixs` (fusion.py:236-343): the centre
    pixel is `round(x*f/z + c)` cast to int, pattern offsets are added as
    (dx, dy) to (pix_x, pix_y).  Assumes fx is used for x and fy for y.

    Returns int64 (N, P, 2) with last dim (pix_x, pix_y).
    """
    fx, fy = float(cam_k[0, 0]), float(cam_k[1, 1])
    cx, cy = float(cam_k[0, 2]), float(cam_k[1, 2])
    z = cam_pts[:, 2]
    # np.round then int() truncation toward zero, exactly like the numba code
    x_center = np.round(cam_pts[:, 0] * fx / z + cx).astype(np.int64)
    y_center = np.round(cam_pts[:, 1] * fy / z + cy).astype(np.int64)
    pattern = np.asarray(PIXEL_PATTERNS[pattern_id], dtype=np.int64)  # (P, 2)
    pix = np.empty((cam_pts.shape[0], pattern.shape[0], 2), dtype=np.int64)
    pix[:, :, 0] = x_center[:, None] + pattern[None, :, 0]
    pix[:, :, 1] = y_center[:, None] + pattern[None, :, 1]
    return pix


def vox2pix(
    cam_E: np.ndarray,
    cam_k: np.ndarray,
    vox_origin: np.ndarray,
    voxel_size: float,
    img_W: int,
    img_H: int,
    scene_size: Tuple[float, float, float],
    pattern_id: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Project voxel centroids into pixel pattern coordinates + FOV mask.

    Vectorized equivalent of reference helpers.py:94-169.

    Args:
        cam_E: (4, 4) world/lidar -> camera transform.
        cam_k: (3, 3) intrinsics.
        vox_origin: (3,) coordinates of voxel (0, 0, 0) corner.
        voxel_size: metres per voxel at this scale.
        img_W, img_H: image size in pixels.
        scene_size: scene extent in metres.
        pattern_id: index into PIXEL_PATTERNS.

    Returns:
        projected_pix: (N, P, 2) int64 pixel coordinates (x, y).
        fov_mask: (N, P) bool — pattern point inside image and z > 0.
        pix_z: (N,) float32 camera-frame depth of each voxel centroid.
    """
    vox_origin = np.asarray(vox_origin, dtype=np.float64)
    vol_dim = tuple(
        int(np.ceil(s / voxel_size)) for s in np.asarray(scene_size, dtype=np.float64)
    )
    pts_world = voxel_centroids(vox_origin, vol_dim, voxel_size)
    cam_pts = rigid_transform(pts_world, np.asarray(cam_E))
    projected_pix = project_pattern_pixels(cam_pts, np.asarray(cam_k), pattern_id)

    pix_x = projected_pix[:, :, 0]
    pix_y = projected_pix[:, :, 1]
    pix_z = cam_pts[:, 2]
    fov_mask = (
        (pix_x >= 0)
        & (pix_x < img_W)
        & (pix_y >= 0)
        & (pix_y < img_H)
        & (pix_z[:, None] > 0)
    )
    return projected_pix, fov_mask, pix_z


def feature_dims(img_H: int, img_W: int, scale: int) -> Tuple[int, int]:
    """Feature-map dims at a 2D scale under successive stride-2 TF-SAME convs.

    Each stride-2 SAME conv produces ceil(dim / 2), so scale s gives
    repeated ceil-halving (e.g. 370x1220 -> 93x305 at scale 4, matching the
    reference feature dict shapes in OccDepth.py:348-355).
    """
    h, w = img_H, img_W
    while scale > 1:
        h = -(-h // 2)
        w = -(-w // 2)
        scale //= 2
    return h, w


def flat_gather_indices(
    projected_pix: np.ndarray,
    fov_mask: np.ndarray,
    img_H: int,
    img_W: int,
    scale: int = 1,
) -> np.ndarray:
    """Precompute flat image indices for the SFA gather at a 2D scale.

    The SFA module gathers `x2d.reshape(HW, C)[index]` with a sentinel row
    `HW` of zeros for out-of-FOV pattern points (reference SFA.py:17-30:
    `img_indices = pix_y * w + pix_x; img_indices[~fov] = h * w`), after the
    reference's integer-division by scale (OccDepth.py:287
    `projected_pix // scale_2d`).  The row/sentinel use the *actual*
    feature-map width/height at this scale (ceil-div under TF-SAME).

    Returns int32 (N, P); value h*w marks "gather the zero row".
    """
    h, w = feature_dims(img_H, img_W, scale)
    pix = projected_pix // scale if scale > 1 else projected_pix
    idx = pix[..., 1] * w + pix[..., 0]
    idx = np.where(fov_mask, idx, h * w)
    return idx.astype(np.int32)
