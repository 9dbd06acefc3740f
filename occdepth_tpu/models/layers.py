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


class _BNCore(nn.Module):
    """Hand-rolled BatchNorm, bit-identical to flax nn.BatchNorm(dtype=f32).

    Two TPU-motivated differences from wrapping nn.BatchNorm directly
    (pytree/scope layout is unchanged — params scale/bias and batch_stats
    mean/var under the same "BatchNorm_0" name):

    * the fp32 cast + stats + normalize run under `jax.checkpoint`, so the
      backward recomputes them from the bf16 input instead of storing an
      fp32 copy of the activation — on the full 256x256x32 grid and the
      370x1220 decoder maps those saved fp32 residuals were among the
      largest HBM tensors of the train step (see docs/DESIGN.md);
    * statistics math replicates flax's _compute_stats/_normalize exactly:
      mean, mean2 = mean(x), mean(x^2); var = max(0, mean2 - mean^2);
      y = (x - mean) * (rsqrt(var + eps) * scale) + bias, all fp32.
    """

    momentum: float  # flax-style momentum (1 - torch momentum)
    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        import jax

        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        axes = tuple(range(x.ndim - 1))
        eps = self.epsilon

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            mul = jax.lax.rsqrt(var + eps) * scale
            y = (x.astype(jnp.float32) - mean) * mul + bias
            return y.astype(x.dtype)

        def bn_train(x, scale, bias):
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axes)
            mean2 = jnp.mean(jnp.square(xf), axes)
            var = jnp.maximum(0.0, mean2 - jnp.square(mean))
            mul = jax.lax.rsqrt(var + eps) * scale
            y = ((xf - mean) * mul + bias).astype(x.dtype)
            return y, mean, var

        y, mean, var = jax.checkpoint(bn_train)(x, scale, bias)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return y


class BatchNorm(nn.Module):
    """BatchNorm matching torch defaults (eps 1e-5), fp32 statistics."""

    momentum_torch: float = 0.1  # torch-style momentum
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return _BNCore(
            momentum=1.0 - self.momentum_torch,
            epsilon=self.epsilon,
            name="BatchNorm_0",
        )(x, use_running_average=not train)


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
