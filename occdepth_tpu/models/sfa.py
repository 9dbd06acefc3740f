"""SFA: multi-scale FLoSP lifting with Stereo-SFA cross-view fusion.

Functional (parameter-free) rewrite of the reference SFA module
(occdepth/models/SFA.py:5-106) plus the per-batch / per-scale python loops of
OccDepth._forward_2d_to_3d (occdepth/models/OccDepth.py:262-298).

All (batch, view) maps of a scale are gathered by ONE flat `take` with
offset indices (`flosp_gather_flat`): XLA's TPU lowering of a gather with
batch dims (what vmap produces) is ~8x slower than the identical gather
with batch folded into the row dimension.  Only the (cheap, elementwise)
cross-view cosine fusion is vmapped.
"""
from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from occdepth_tpu.ops.flosp_gather import flosp_gather_flat, multiview_cosine_fuse


def sfa_lift(
    x_rgb: Dict[str, jnp.ndarray],  # {'1_s': (B, V, h_s, w_s, C)}
    projected_pix: jnp.ndarray,  # (B, V, N, P, 2) int32, project_scale coords
    fov_mask: jnp.ndarray,  # (B, V, N, P) bool
    project_res: Sequence[int],
    scene_dims: Tuple[int, int, int],
    dataset: str,
    use_pallas: bool = False,
    unroll_gathers: bool = True,
) -> jnp.ndarray:
    """Lift multi-scale 2D features to the 3D grid, summed over scales.

    Returns (B, X, Y, Z, C) with the dataset's grid layout:
      * kitti/tartanair: flat voxel order reshapes directly to (X, Y, Z)
        (SFA.py:98-104);
      * NYU: flat order is world (X, Y, Z_up) = (60, 60, 36); the scene
        layout is (X, Z_up, Y) = (60, 36, 60) (SFA.py:90-97 reshape+permute).
    """
    fuse = jax.vmap(
        lambda f, v: multiview_cosine_fuse(f, v, use_pallas=use_pallas)
    )

    x3d = None
    for scale in project_res:
        pix = projected_pix // scale if scale > 1 else projected_pix
        feats, valid = flosp_gather_flat(
            x_rgb[f"1_{scale}"], pix, fov_mask, unroll=unroll_gathers
        )  # (B, V, N, C), (B, V, N)
        fused = fuse(feats, valid)  # (B, N, C)
        x3d = fused if x3d is None else x3d + fused

    B, N, C = x3d.shape
    X, Y, Z = scene_dims
    if dataset == "NYU":
        # flat order (X=60, Y=60, Z=36) -> scene layout (X, Z, Y)
        x3d = x3d.reshape(B, X, Z, Y, C).transpose(0, 1, 3, 2, 4)
    else:
        x3d = x3d.reshape(B, X, Y, Z, C)
    return x3d
