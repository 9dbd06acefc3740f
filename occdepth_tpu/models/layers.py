"""Shared flax building blocks (channels-last, TPU layouts).

Conventions:
  * 2D tensors are (B, H, W, C); 3D tensors are (B, X, Y, Z, C) — XLA's
    native TPU conv layouts (the reference is NCHW/NCDHW torch).
  * BatchNorm statistics are computed over all non-channel axes; under a
    GSPMD-sharded batch this is automatically a cross-replica ("sync") BN,
    matching the reference's `Trainer(sync_batchnorm=True)`
    (scripts/train.py:179).
  * `torch momentum m` == `flax momentum 1 - m`.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5), fp32 statistics."""

    momentum_torch: float = 0.1  # torch-style momentum
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        orig_dtype = x.dtype
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=1.0 - self.momentum_torch,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class ConvBN(nn.Module):
    """Conv + BN + activation with torch-equivalent explicit padding."""

    features: int
    kernel: Tuple[int, ...]
    strides: Tuple[int, ...] = None  # type: ignore[assignment]
    padding: Any = None  # default: torch "padding=k//2" when None
    use_bias: bool = False
    bn_momentum: float = 0.1
    act: Optional[Callable] = nn.relu
    dilation: Tuple[int, ...] = None  # type: ignore[assignment]
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        k = self.kernel
        pad = self.padding
        if pad is None:
            pad = tuple((d * (kk // 2), d * (kk // 2)) for kk, d in zip(
                k, self.dilation or (1,) * len(k)))
        x = nn.Conv(
            self.features,
            k,
            strides=self.strides or (1,) * len(k),
            padding=pad,
            use_bias=self.use_bias,
            kernel_dilation=self.dilation or (1,) * len(k),
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = BatchNorm(momentum_torch=self.bn_momentum, dtype=self.dtype)(x, train)
        if self.act is not None:
            x = self.act(x)
        return x


def torch_conv(
    features: int,
    kernel: Sequence[int],
    strides: Optional[Sequence[int]] = None,
    padding: Optional[Sequence[int]] = None,
    use_bias: bool = True,
    dilation: Optional[Sequence[int]] = None,
    dtype: Optional[Dtype] = None,
    name: Optional[str] = None,
):
    """nn.Conv with torch-style integer padding (symmetric per-dim).

    3-spatial-dim convs use the exact decompose-to-2D path (Conv3DFast) —
    XLA's native conv3d TPU lowering is ~10x slower (see ops/conv3d_fast).
    """
    kernel = tuple(kernel)
    if padding is None:
        padding = tuple(k // 2 for k in kernel)
    pad = tuple((p, p) for p in padding)
    strides = tuple(strides) if strides else (1,) * len(kernel)
    dilation = tuple(dilation) if dilation else (1,) * len(kernel)
    if len(kernel) == 3:
        from occdepth_tpu.ops.conv3d_fast import Conv3DFast

        return Conv3DFast(
            features,
            kernel,
            strides=strides,
            padding=pad,
            kernel_dilation=dilation,
            use_bias=use_bias,
            dtype=dtype,
            param_dtype=jnp.float32,
            name=name,
        )
    return nn.Conv(
        features,
        kernel,
        strides=strides,
        padding=pad,
        use_bias=use_bias,
        kernel_dilation=dilation,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def avg_pool(x: jnp.ndarray, window: Tuple[int, ...], strides: Tuple[int, ...]):
    """AvgPool over the spatial dims of a channels-last tensor."""
    dims = (1,) + window + (1,)
    strd = (1,) + strides + (1,)
    return nn.avg_pool(x, dims[1:-1], strides=strd[1:-1], padding="VALID")


def leaky_relu(x: jnp.ndarray, negative_slope: float = 0.01) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=negative_slope)
