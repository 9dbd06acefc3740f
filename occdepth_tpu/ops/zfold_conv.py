"""Lane-folded ("z-fold") formulations of full-grid 3D convolutions.

Motivation (see docs/DESIGN.md "Static HLO roofline profile"): the
flagship train step is ~93% HBM-bound, and the largest single sink is
layout motion on full-grid tensors (B, 256, 256, 32, C=16..32).  With
channels last, C sits on the 128-lane axis and pads every vector tile
4-8x; the compiler bounces these tensors between compact and padded
layouts thousands of times per step.

The z-fold reshapes (B, X, Y, Z, C) -> (B, X, Y, Z*C): the minor-most
dim becomes 512+ and every tile is fully utilized, so elementwise ops,
batch-norm and convs all consume ONE layout and the copies disappear.

A 3x3x3 conv on the folded layout is a 2D conv over (X, Y) whose channel
matrix is block-banded in z:

    W2[dx, dy, zi*Ci + ci, zo*Co + co] = K[dx, dy, zi-zo+1, ci, co]
                                          for |zi - zo| <= 1, else 0

built in-graph from the SAME (kx, ky, kz, Ci, Co) parameter used by
Conv3DFast — parameter pytrees and checkpoints are unaffected.  The
banded matrix natively realizes torch's zero padding along z at the
band edges.  The dense form spends kz*Z/(kz) = Z/1 extra MXU flops on
structural zeros; whether that beats the relayout traffic is measured
by scripts/bench_zfold.py, not assumed.

Reference semantics: occdepth/models/modules.py conv3d stacks; exactness
vs conv3d_decomposed is asserted in tests/test_zfold.py.
"""
from __future__ import annotations

from typing import Tuple

import jax.lax as lax
import jax.numpy as jnp


def band_weights(kernel: jnp.ndarray, Z: int) -> jnp.ndarray:
    """(kx, ky, kz, Ci, Co) -> banded-dense (kx, ky, Z*Ci, Z*Co).

    Implements z 'SAME' zero padding for odd kz: output z position zo
    reads input zi = zo + kz_idx - kz//2.
    """
    kx, ky, kz, Ci, Co = kernel.shape
    w = jnp.zeros((kx, ky, Z * Ci, Z * Co), kernel.dtype)
    for k in range(kz):
        shift = k - kz // 2  # zi - zo
        # E[zi, zo] = 1 where zi = zo + shift  -> np.eye(k=-shift)
        e = jnp.eye(Z, k=-shift, dtype=kernel.dtype)
        # (Z, Z) x (kx, ky, Ci, Co) -> (kx, ky, Z, Ci, Z, Co)
        blk = jnp.einsum("ab,xyio->xyaibo", e, kernel[:, :, k])
        w = w + blk.reshape(kx, ky, Z * Ci, Z * Co)
    return w


def zfold_conv3d(
    x: jnp.ndarray,  # (B, X, Y, Z, Ci)
    kernel: jnp.ndarray,  # (kx, ky, kz, Ci, Co)
    padding: Tuple[Tuple[int, int], Tuple[int, int]],  # (X, Y) padding
    dilation: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """3D conv (stride 1, z-padding kz//2) on the lane-folded layout.

    Exactly Conv3DFast with strides (1,1,1), padding (px, py, kz//2),
    for inputs already/left in the folded (B, X, Y, Z*Ci) world — the
    caller folds once per region, not per conv.
    """
    B, X, Y, Z, Ci = x.shape
    w = band_weights(kernel, Z)
    xf = x.reshape(B, X, Y, Z * Ci)
    of = lax.conv_general_dilated(
        xf, w, (1, 1), list(padding),
        rhs_dilation=list(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    Co = kernel.shape[-1]
    return of.reshape(B, of.shape[1], of.shape[2], Z, Co)


def zfold_conv3d_folded(
    xf: jnp.ndarray,  # (B, X, Y, Z*Ci) already folded
    kernel: jnp.ndarray,  # (kx, ky, kz, Ci, Co)
    Z: int,
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    dilation: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """Folded-in/folded-out variant: (B, X, Y, Z*Ci) -> (B, X, Y, Z*Co)."""
    w = band_weights(kernel, Z)
    return lax.conv_general_dilated(
        xf, w, (1, 1), list(padding),
        rhs_dilation=list(dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=xf.dtype,
    )


def zfold_conv3d_grouped(
    x: jnp.ndarray,  # (B, X, Y, Z, Ci)
    kernel: jnp.ndarray,  # (kx, ky, kz, Ci, Co)
    padding: Tuple[Tuple[int, int], Tuple[int, int]],
    dilation: Tuple[int, int] = (1, 1),
) -> jnp.ndarray:
    """3-tap grouped-conv formulation on the folded layout.

    For each kz tap: lane-shift the folded input by (kz_idx - kz//2)*Ci
    and apply a feature_group_count=Z conv whose per-group weights are
    the shared (Ci, Co) slice.  FLOP count matches the unfolded conv;
    the lane shifts are whole-tensor copies at full lane utilization.
    """
    B, X, Y, Z, Ci = x.shape
    kx, ky, kz, _, Co = kernel.shape
    xf = x.reshape(B, X, Y, Z * Ci)
    out = None
    for k in range(kz):
        shift = (k - kz // 2) * Ci  # input lane offset
        if shift > 0:
            xs = jnp.pad(xf[..., shift:], ((0, 0),) * 3 + ((0, shift),))
        elif shift < 0:
            xs = jnp.pad(xf[..., :shift], ((0, 0),) * 3 + ((-shift, 0),))
        else:
            xs = xf
        # per-group weights identical, zo-major blocks of Co
        wg = jnp.broadcast_to(
            kernel[:, :, k][:, :, :, None, :], (kx, ky, Ci, Z, Co)
        ).reshape(kx, ky, Ci, Z * Co)
        o = lax.conv_general_dilated(
            xs, wg, (1, 1), list(padding),
            rhs_dilation=list(dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=Z,
            preferred_element_type=x.dtype,
        )
        out = o if out is None else out + o
    return out.reshape(B, out.shape[1], out.shape[2], Z, Co)
