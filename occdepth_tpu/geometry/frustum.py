"""Frustum sampling-grid generation as pure JAX functions.

TPU-first rewrite of the reference's kornia-based FrustumGridGenerator
(occdepth/models/f2v/frustum_grid_generator.py:8-152): ~30 lines of
homogeneous transforms with static shapes, no Module state, vmappable over
batch and cameras.  Produces the normalized (u, v, depth-bin) sampling grid
consumed by the trilinear frustum->voxel resampler.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from occdepth_tpu.geometry.depth_bins import bin_depths

OUT_OF_BOUNDS_VAL = -2.0  # reference frustum_grid_generator.py:21


@dataclasses.dataclass(frozen=True)
class FrustumGridSpec:
    """Static geometry of the voxel grid + depth discretization.

    pc_range/grid_size mirror FrustumGridGenerator.__init__
    (frustum_grid_generator.py:17-45).
    """

    grid_size: Tuple[int, int, int]  # (X, Y, Z) voxels
    pc_range: Tuple[float, float, float, float, float, float]
    num_bins: int
    depth_min: float
    depth_max: float
    mode: str = "LID"
    final_dim: Tuple[int, int] = (370, 1220)  # (H, W) image size

    @property
    def pc_min(self) -> np.ndarray:
        return np.asarray(self.pc_range[:3], dtype=np.float32)

    @property
    def voxel_size(self) -> np.ndarray:
        lo = np.asarray(self.pc_range[:3], dtype=np.float32)
        hi = np.asarray(self.pc_range[3:], dtype=np.float32)
        return (hi - lo) / np.asarray(self.grid_size, dtype=np.float32)


def voxel_grid_points(
    spec: FrustumGridSpec, pc_min: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Voxel-centre points in lidar/world coords, shape (X, Y, Z, 3).

    Equivalent to create_meshgrid3d + 0.5 offset + grid_to_lidar unprojection
    (frustum_grid_generator.py:32-68): p = pc_min + voxel_size * (idx + 0.5).

    `pc_min` may be a traced (3,) array to support NYU's per-batch voxel
    origin (reference re-registers buffers per batch, flosp_depth.py:466-518;
    here the origin is simply a function input).
    """
    X, Y, Z = spec.grid_size
    if pc_min is None:
        pc_min = jnp.asarray(spec.pc_min)
    xs = (jnp.arange(X, dtype=jnp.float32) + 0.5) * spec.voxel_size[0] + pc_min[0]
    ys = (jnp.arange(Y, dtype=jnp.float32) + 0.5) * spec.voxel_size[1] + pc_min[1]
    zs = (jnp.arange(Z, dtype=jnp.float32) + 0.5) * spec.voxel_size[2] + pc_min[2]
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def frustum_grid(
    spec: FrustumGridSpec,
    lidar_to_cam: jnp.ndarray,
    cam_to_img: jnp.ndarray,
    ida_mat: jnp.ndarray,
    pc_min: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Build the normalized frustum sampling grid for one camera.

    Args:
        spec: static grid geometry.
        lidar_to_cam: (4, 4) extrinsics.
        cam_to_img: (3, 4) projection (intrinsics @ eye(3,4)).
        ida_mat: (4, 4) image-data-augmentation matrix applied to (u, v).

    Returns:
        (X, Y, Z, 3) float32 grid of normalized (u, v, depth_bin) in [-1, 1],
        with non-finite entries replaced by OUT_OF_BOUNDS_VAL
        (reference transform_grid + normalize_coords,
        frustum_grid_generator.py:70-152).
    """
    pts = voxel_grid_points(spec, pc_min)  # (X, Y, Z, 3)
    ones = jnp.ones(pts.shape[:-1] + (1,), pts.dtype)
    pts_h = jnp.concatenate([pts, ones], axis=-1)  # (X, Y, Z, 4)

    cam = jnp.einsum("ij,xyzj->xyzi", lidar_to_cam.astype(jnp.float32), pts_h)
    img = jnp.einsum("ij,xyzj->xyzi", cam_to_img.astype(jnp.float32), cam)

    # homogeneous divide; depth excludes the projection-matrix translation
    # (transform_utils.project_to_image:24: depth = w - P[2, 3])
    w = img[..., 2:3]
    uv = img[..., :2] / w
    depth = img[..., 2] - cam_to_img[2, 3]

    dbin = bin_depths(
        depth, spec.mode, spec.depth_min, spec.depth_max, spec.num_bins, xp=jnp
    )
    grid = jnp.concatenate([uv, dbin[..., None]], axis=-1)  # (X, Y, Z, 3)

    # inverse image augmentation on (u, v[, dbin]) as homogeneous points
    grid_h = jnp.concatenate([grid, jnp.ones_like(w)], axis=-1)
    grid = jnp.einsum("ij,xyzj->xyzi", ida_mat.astype(jnp.float32), grid_h)[..., :3]

    # normalize to [-1, 1] by (dim - 1) (grid_utils.normalize_coords:4-19)
    H, W = spec.final_dim
    denom = jnp.asarray(
        [W - 1, H - 1, spec.num_bins - 1], dtype=jnp.float32
    )
    grid = grid / denom * 2.0 - 1.0

    return jnp.where(jnp.isfinite(grid), grid, OUT_OF_BOUNDS_VAL)
