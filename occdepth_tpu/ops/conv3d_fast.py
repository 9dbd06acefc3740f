"""Fast 3D convolution: decompose along the leading spatial dim into 2D convs.

XLA's TPU lowering of true 3-spatial-dim convolutions is ~10x slower than
the mathematically identical decomposition

    conv3d(x, K)[:, xo] = sum_i conv2d(x_pad[:, xo*sx + i*dx], K[i])

where the leading spatial dim folds into the batch and each K[i] is a 2D
kernel slice (measured 6.9ms -> 0.7ms for a (256,256,32,16)->16 3x3x3 conv
on v5e).  `Conv3DFast` is a drop-in for flax nn.Conv on 5D inputs with the
identical parameter pytree ({kernel, bias}, kernel (kx,ky,kz,I,O)), so
checkpoints and the torch converter are unaffected.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax.lax as lax
import jax.numpy as jnp


def conv3d_decomposed(
    x: jnp.ndarray,  # (B, X, Y, Z, I)
    kernel: jnp.ndarray,  # (kx, ky, kz, I, O)
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], ...],
    dilation: Tuple[int, int, int],
) -> jnp.ndarray:
    B, X, Y, Z, I = x.shape
    kx, ky, kz, _, O = kernel.shape
    sx, sy, sz = strides
    dx, dy, dz = dilation
    (px0, px1), pyz = padding[0], padding[1:]

    xp = jnp.pad(x, ((0, 0), (px0, px1), (0, 0), (0, 0), (0, 0)))
    Xp = X + px0 + px1
    out_x = (Xp - (kx - 1) * dx - 1) // sx + 1

    out = None
    for i in range(kx):
        start = i * dx
        xs = lax.slice_in_dim(xp, start, start + (out_x - 1) * sx + 1, sx, 1)
        x2 = xs.reshape(B * out_x, Y, Z, I)
        o = lax.conv_general_dilated(
            x2, kernel[i], (sy, sz), list(pyz),
            rhs_dilation=(dy, dz),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        out = o if out is None else out + o
    h, w = out.shape[1], out.shape[2]
    return out.reshape(B, out_x, h, w, O)


def conv_transpose3d_decomposed(
    x: jnp.ndarray,  # (B, X, Y, Z, I)
    kernel: jnp.ndarray,  # (kx, ky, kz, O, I) — flax transpose_kernel layout
    strides: Tuple[int, int, int],
    padding: Tuple[Tuple[int, int], ...],  # conv_transpose padding
) -> jnp.ndarray:
    """ConvTranspose3d as zero-interleave + decomposed stride-1 conv.

    Equivalent to flax nn.ConvTranspose(transpose_kernel=True): dilate the
    input by the stride, pad by the transpose padding, and run a plain
    conv with the spatially-flipped kernel (in/out swapped) — which then
    uses the fast 2D decomposition instead of XLA's slow native 3D path.
    """
    B, X, Y, Z, I = x.shape
    kx, ky, kz, O, _ = kernel.shape
    sx, sy, sz = strides

    def dilate(a, axis, s, lo, hi):
        if s == 1:
            pads = [(0, 0, 0)] * a.ndim
            pads[axis] = (lo, hi, 0)
            return lax.pad(a, jnp.zeros((), a.dtype), pads)
        pads = [(0, 0, 0)] * a.ndim
        pads[axis] = (lo, hi, s - 1)
        return lax.pad(a, jnp.zeros((), a.dtype), pads)

    (px0, px1), (py0, py1), (pz0, pz1) = padding
    xd = dilate(x, 1, sx, px0, px1)
    xd = dilate(xd, 2, sy, py0, py1)
    xd = dilate(xd, 3, sz, pz0, pz1)

    k_conv = jnp.flip(kernel, (0, 1, 2)).transpose(0, 1, 2, 4, 3)  # (k,I,O)
    return conv3d_decomposed(
        xd, k_conv, (1, 1, 1), ((0, 0), (0, 0), (0, 0)), (1, 1, 1)
    )


class ConvTranspose3DFast(nn.Module):
    """nn.ConvTranspose(transpose_kernel=True)-compatible fast version."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = ((0, 0), (0, 0), (0, 0))
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        I = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (self.features, I),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        y = conv_transpose3d_decomposed(
            x.astype(dtype), kernel.astype(dtype),
            tuple(self.strides), tuple(self.padding),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(dtype)
        return y


class Conv3DFast(nn.Module):
    """nn.Conv-compatible 3D conv using the 2D decomposition."""

    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    padding: Any = ((0, 0), (0, 0), (0, 0))
    kernel_dilation: Tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        I = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            self.kernel_size + (I, self.features),
            self.param_dtype,
        )
        dtype = self.dtype or x.dtype
        y = conv3d_decomposed(
            x.astype(dtype), kernel.astype(dtype),
            tuple(self.strides), tuple(self.padding),
            tuple(self.kernel_dilation),
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                self.param_dtype,
            )
            y = y + bias.astype(dtype)
        return y
