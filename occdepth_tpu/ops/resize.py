"""Image resize ops matching torch.nn.functional.interpolate semantics.

The reference uses three interpolate flavours on the hot path:
  * bilinear align_corners=True — 2D decoder upsampling (unet2d.py:39-44)
  * bilinear align_corners=False — depth-map rescale for the virtual view
    (OccDepth.py:239-243)
  * nearest — GT-depth upsample in the depth loss (depth_loss.py:69-73)

All functions take channels-last (..., H, W, C) arrays and are jittable.
XLA lowers the einsum-style weighted gathers to fused HBM-friendly code.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _linspace_weights(in_size: int, out_size: int, align_corners: bool):
    """Source indices + lerp weights along one axis (torch convention)."""
    out = jnp.arange(out_size, dtype=jnp.float32)
    if align_corners:
        if out_size == 1:
            src = jnp.zeros((1,), jnp.float32)
        else:
            src = out * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = jnp.clip((out + 0.5) * scale - 0.5, 0.0, None)
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w_hi = src - lo.astype(jnp.float32)
    return lo, hi, w_hi


def resize_bilinear(
    x: jnp.ndarray, size: Tuple[int, int], align_corners: bool
) -> jnp.ndarray:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C)."""
    H_out, W_out = size
    H_in, W_in = x.shape[-3], x.shape[-2]
    if (H_in, W_in) == (H_out, W_out):
        return x
    ylo, yhi, wy = _linspace_weights(H_in, H_out, align_corners)
    xlo, xhi, wx = _linspace_weights(W_in, W_out, align_corners)

    dtype = x.dtype
    xf = x.astype(jnp.float32)
    top = jnp.take(xf, ylo, axis=-3)
    bot = jnp.take(xf, yhi, axis=-3)
    rows = top * (1.0 - wy)[..., :, None, None] + bot * wy[..., :, None, None]
    left = jnp.take(rows, xlo, axis=-2)
    right = jnp.take(rows, xhi, axis=-2)
    out = left * (1.0 - wx)[..., :, None] + right * wx[..., :, None]
    return out.astype(dtype)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of (..., H, W, C), torch 'nearest' (floor) convention."""
    H_out, W_out = size
    H_in, W_in = x.shape[-3], x.shape[-2]
    ys = jnp.floor(
        jnp.arange(H_out, dtype=jnp.float32) * (H_in / H_out)
    ).astype(jnp.int32)
    xs = jnp.floor(
        jnp.arange(W_out, dtype=jnp.float32) * (W_in / W_out)
    ).astype(jnp.int32)
    ys = jnp.clip(ys, 0, H_in - 1)
    xs = jnp.clip(xs, 0, W_in - 1)
    return jnp.take(jnp.take(x, ys, axis=-3), xs, axis=-2)
