"""OAD depth distillation loss.

Reference: occdepth/loss/depth_loss.py:7-87.  The GT depth map is
nearest-upsampled to a multiple of the downsample factor, min-pooled per
patch (zeros treated as +inf), binned *uniformly* with the d_bound step (the
reference bins targets UD even though the DepthNet grid is LID — replicated
as-is), one-hot encoded, and compared to the softmaxed depth distribution
with BCE over foreground pixels only, in fp32.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from occdepth_tpu.ops.resize import resize_nearest

_LOG_CLAMP = 100.0
_TINY = 1e-37


def _clamped_log(x: jnp.ndarray) -> jnp.ndarray:
    """log(x) clamped at -100 (torch BCE) with a FINITE backward.

    `max(log(max(x, 0)), -100)` NaNs in backward at x == 0 (0 * inf); see
    losses/ssc.py _safe_neg_log.  With 104 depth bins the softmax routinely
    underflows to exact fp32 zero on real images, so this is load-bearing.
    """
    safe = x > _TINY
    return jnp.where(safe, jnp.log(jnp.where(safe, x, 1.0)), -_LOG_CLAMP)


def _downsampled_gt_bins(
    gt: jnp.ndarray, downsample: int, d_bound: Tuple[float, float, float],
    depth_channels: int,
) -> jnp.ndarray:
    """(B', H, W) metric depth -> (B'*h*w, D) one-hot bin target."""
    Bp, H, W = gt.shape
    h, w = H // downsample, W // downsample
    patches = gt.reshape(Bp, h, downsample, w, downsample)
    patches = patches.transpose(0, 1, 3, 2, 4).reshape(Bp, h, w, -1)
    patches = jnp.where(patches == 0.0, 1e5, patches)
    mind = patches.min(axis=-1)  # (B', h, w)

    idx = (mind - (d_bound[0] - d_bound[2])) / d_bound[2]
    idx = jnp.where((idx < depth_channels + 1) & (idx >= 0.0), idx, 0.0)
    idx = idx.astype(jnp.int32).reshape(-1)
    # comparison-based one-hot (scatter-free: TPU scatters are very slow)
    bins = jnp.arange(1, depth_channels + 1, dtype=jnp.int32)[None, :]
    return (idx[:, None] == bins).astype(jnp.float32)


def depth_cls_loss(
    depth_labels: jnp.ndarray,  # (B, n_cam, H, W) metric GT depth
    depth_preds: jnp.ndarray,  # (B, n_cam, h, w, D) softmaxed distribution
    downsample: int,
    d_bound: Tuple[float, float, float],
) -> jnp.ndarray:
    depth_channels = int((d_bound[1] - d_bound[0]) / d_bound[2])
    B, n_cam, h, w, D = depth_preds.shape
    gt = depth_labels.reshape(-1, *depth_labels.shape[2:])  # (B', H, W)

    # nearest-resize GT to (h*ds, w*ds) (depth_loss.py:69-73)
    gt = resize_nearest(gt[..., None], (h * downsample, w * downsample))[..., 0]
    labels = _downsampled_gt_bins(gt, downsample, d_bound, depth_channels)

    preds = depth_preds.reshape(-1, D).astype(jnp.float32)  # (B'*h*w, D)
    fg = (labels.max(axis=1) > 0.0).astype(jnp.float32)  # (B'*h*w,)

    p = jnp.clip(preds, 0.0, 1.0)
    bce = -(
        labels * _clamped_log(p) + (1.0 - labels) * _clamped_log(1.0 - p)
    )
    loss = (bce * fg[:, None]).sum() / jnp.maximum(fg.sum(), 1.0)
    return loss
