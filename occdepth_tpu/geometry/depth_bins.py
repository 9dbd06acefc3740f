"""Depth discretization (UD / LID / SID) — works on NumPy or JAX arrays.

Reference: occdepth/models/f2v/utils/depth_utils.py:5-43.
"""
from __future__ import annotations

import math


def bin_depths(depth_map, mode, depth_min, depth_max, num_bins, target=False, xp=None):
    """Convert a depth map into (continuous or integer) bin indices.

    Args:
        depth_map: array of metric depths.
        mode: "UD" uniform | "LID" linearly-increasing | "SID" spacing-increasing.
        depth_min, depth_max: discretization range.
        num_bins: number of depth bins.
        target: if True, clamp out-of-range/non-finite indices to num_bins and
            return integers (used for loss targets).
        xp: array namespace (numpy or jax.numpy); inferred if None.
    """
    if xp is None:
        import numpy as _np

        xp = _np if not hasattr(depth_map, "aval") else __import__("jax.numpy", fromlist=["jnp"])
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        indices = (depth_map - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        indices = -0.5 + 0.5 * xp.sqrt(1 + 8 * (depth_map - depth_min) / bin_size)
    elif mode == "SID":
        indices = (
            num_bins
            * (xp.log(1 + depth_map) - math.log(1 + depth_min))
            / (math.log(1 + depth_max) - math.log(1 + depth_min))
        )
    else:
        raise NotImplementedError(mode)

    if target:
        mask = (indices < 0) | (indices > num_bins) | ~xp.isfinite(indices)
        indices = xp.where(mask, num_bins, indices).astype(xp.int32)
    return indices
