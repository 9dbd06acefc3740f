"""SFA: multi-scale FLoSP lifting with Stereo-SFA cross-view fusion.

Functional (parameter-free) rewrite of the reference SFA module
(occdepth/models/SFA.py:5-106) plus the per-batch / per-scale python loops of
OccDepth._forward_2d_to_3d (occdepth/models/OccDepth.py:262-298): everything
is vmapped over batch; pattern points are gathered in one shot via the
zero-sentinel-row trick.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from occdepth_tpu.ops.flosp_gather import flosp_gather, multiview_cosine_fuse


def _lift_one_scale(
    x2d: jnp.ndarray,  # (V, h, w, C)
    projected_pix: jnp.ndarray,  # (V, N, P, 2) full-res pixel coords
    fov_mask: jnp.ndarray,  # (V, N, P) bool
    scale: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-view gather+mean at one 2D scale -> (V, N, C) feats, (V, N) valid."""
    V, h, w, C = x2d.shape
    pix = projected_pix // scale if scale > 1 else projected_pix
    idx = pix[..., 1] * w + pix[..., 0]  # (V, N, P)
    idx = jnp.where(fov_mask, idx, h * w).astype(jnp.int32)
    counts = fov_mask.sum(axis=-1).astype(jnp.float32)  # (V, N)

    feats = jax.vmap(flosp_gather)(x2d, idx, counts)  # (V, N, C)
    valid = (counts > 0).astype(feats.dtype)
    return feats, valid


def sfa_lift(
    x_rgb: Dict[str, jnp.ndarray],  # {'1_s': (B, V, h_s, w_s, C)}
    projected_pix: jnp.ndarray,  # (B, V, N, P, 2) int32, project_scale coords
    fov_mask: jnp.ndarray,  # (B, V, N, P) bool
    project_res: Sequence[int],
    scene_dims: Tuple[int, int, int],
    dataset: str,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Lift multi-scale 2D features to the 3D grid, summed over scales.

    Returns (B, X, Y, Z, C) with the dataset's grid layout:
      * kitti/tartanair: flat voxel order reshapes directly to (X, Y, Z)
        (SFA.py:98-104);
      * NYU: flat order is world (X, Y, Z_up) = (60, 60, 36); the scene
        layout is (X, Z_up, Y) = (60, 36, 60) (SFA.py:90-97 reshape+permute).
    """

    def lift_sample(x2ds, pix, fov):
        out = None
        for scale in project_res:
            feats, valid = _lift_one_scale(x2ds[f"1_{scale}"], pix, fov, scale)
            fused = multiview_cosine_fuse(
                feats, valid, use_pallas=use_pallas
            )  # (N, C)
            out = fused if out is None else out + fused
        return out

    x3d = jax.vmap(
        lambda pix, fov, *xs: lift_sample(
            {f"1_{s}": x for s, x in zip(project_res, xs)}, pix, fov
        )
    )(projected_pix, fov_mask, *[x_rgb[f"1_{s}"] for s in project_res])

    B, N, C = x3d.shape
    X, Y, Z = scene_dims
    if dataset == "NYU":
        # flat order (X=60, Y=60, Z=36) -> scene layout (X, Z, Y)
        x3d = x3d.reshape(B, X, Z, Y, C).transpose(0, 1, 3, 2, 4)
    else:
        x3d = x3d.reshape(B, X, Y, Z, C)
    return x3d
