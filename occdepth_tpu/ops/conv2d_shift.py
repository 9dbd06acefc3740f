"""3x3 stride-1 SAME conv as 9 row-shifted flat matmuls (+ Pallas fusion).

The 2D decoder's 3x3 convs at 370x1220 run ~10x below MXU peak under
XLA's TPU conv lowering (im2col-traffic-bound: time tracks the ~9x input
re-read, not FLOPs — docs/DESIGN.md finding #6).  The exact same math
maps onto contiguous MXU matmuls with NO gathers and NO im2col:

    pad the image by 1 (H+2, W+2), flatten rows to X ((H+2)*(W+2), Ci).
    For output flat index j = h*(W+2) + w:
        out[j] = sum_k X[j + dr_k*(W+2) + dc_k] @ W[k]      (k = 0..8)
    i.e. nine matmuls of ROW-SHIFTED CONTIGUOUS SLICES of X.  Output
    columns w in {W, W+1} consume wrapped next-row pixels and are garbage;
    they are sliced away after reshaping to (H, W+2).

Two implementations:
  * `conv3x3_shift` — pure XLA (dynamic-slice + dot_general), used as the
    fallback and exactness oracle.
  * `conv3x3_pallas` — a DMA-pipelined Pallas kernel: row tiles of X are
    double-buffered HBM->VMEM ONCE and all nine taps are computed from
    VMEM, so the input is read ~1x instead of ~9x.

Both compute identically to `nn.Conv(features, (3, 3), padding=1)`
(kernel layout HWIO, matching flax; reference decoder convs
occdepth/models/unet2d.py:24-46).
"""
from __future__ import annotations

import functools
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_shift(x: jnp.ndarray, w: jnp.ndarray,
                  b: jnp.ndarray | None = None) -> jnp.ndarray:
    """x (B, H, W, Ci), w (3, 3, Ci, Co) HWIO -> (B, H, W, Co)."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    w = w.astype(x.dtype)  # match the XLA conv's compute-dtype cast
    Wp = W + 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 2 extra tail rows: the garbage columns' largest tap reads index
    # M-1 + 2*Wp + 2 (dynamic_slice would otherwise CLAMP the last slice,
    # silently shifting every tap's window)
    X = jnp.pad(xp.reshape(B, (H + 2) * Wp, Ci), ((0, 0), (0, 2), (0, 0)))
    M = H * Wp
    acc = jnp.zeros((B, M, Co), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            sl = jax.lax.dynamic_slice_in_dim(X, dr * Wp + dc, M, axis=1)
            acc = acc + jax.lax.dot_general(
                sl, w[dr, dc],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    if b is not None:
        acc = acc + b.astype(jnp.float32)
    return acc.reshape(B, H, Wp, Co)[:, :, :W].astype(x.dtype)


def _conv_kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, sems, *,
                 tm, wp, buf_rows, n_tiles, n_steps):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    step = bi * n_tiles + ti
    slot = jax.lax.rem(step, 2)

    def start(s, b2, t2):
        pltpu.make_async_copy(
            x_hbm.at[b2, pl.ds(t2 * tm, buf_rows), :],
            xbuf.at[s], sems.at[s],
        ).start()

    @pl.when(step == 0)
    def _():
        start(0, bi, ti)

    @pl.when(step + 1 < n_steps)
    def _():
        nxt = step + 1
        start(jax.lax.rem(nxt, 2), nxt // n_tiles, jax.lax.rem(nxt, n_tiles))

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * tm, buf_rows), :], xbuf.at[slot],
        sems.at[slot],
    ).wait()

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for k in range(9):
        off = (k // 3) * wp + (k % 3)
        acc = acc + jnp.dot(
            xbuf[slot, pl.ds(off, tm), :], w_ref[k],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def conv3x3_pallas(x: jnp.ndarray, w: jnp.ndarray,
                   b: jnp.ndarray | None = None, block_rows: int = 4096,
                   interpret: bool = False) -> jnp.ndarray:
    """DMA-pipelined shifted-matmul conv.  Same contract as conv3x3_shift."""
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    w = w.astype(x.dtype)
    Wp = W + 2
    M = H * Wp
    tm = min(block_rows, M)
    tm = -(-tm // 16) * 16  # sublane-aligned DMA offsets (i * tm)
    n_tiles = -(-M // tm)
    # buffer extent per tile: tm + the 2*Wp + 2 halo, rounded up so every
    # DMA copies a sublane-aligned row count (Mosaic rejects ragged
    # HBM memref slices)
    buf_rows = -(-(tm + 2 * Wp + 2) // 16) * 16
    rows_needed = n_tiles * tm + buf_rows

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    X = xp.reshape(B, (H + 2) * Wp, Ci)
    if X.shape[1] < rows_needed:
        X = jnp.pad(X, ((0, 0), (0, rows_needed - X.shape[1]), (0, 0)))
    w9 = w.reshape(9, Ci, Co)
    bias = (b if b is not None else jnp.zeros((Co,), jnp.float32))
    bias = bias.reshape(1, Co).astype(jnp.float32)

    n_steps = B * n_tiles
    out = pl.pallas_call(
        functools.partial(
            _conv_kernel, tm=tm, wp=Wp, buf_rows=buf_rows,
            n_tiles=n_tiles, n_steps=n_steps,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tm, Co), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((9, Ci, Co), lambda b2, t2: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda b2, t2: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, Co), lambda b2, t2: (b2, t2, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, buf_rows, Ci), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * 9 * Ci * Co,
            bytes_accessed=X.size * X.dtype.itemsize
            + B * M * Co * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(X, w9, bias)
    return out[:, :M].reshape(B, H, Wp, Co)[:, :, :W]


def resolve_conv_impl(impl: str, train: bool) -> str:
    """Resolve the decoder conv path.  Measured on v5e (bench_conv2d):
    XLA's conv is at MXU peak for channel-rich shapes and the shifted
    dot_general variant loses everywhere (K=48..99 wastes MXU lanes and
    re-reads the input 9x), so 'auto' is plain XLA; 'shift'/'pallas'
    remain forced options for experiments."""
    if impl != "auto":
        return impl
    return "xla"


class Conv3x3Fast(nn.Module):
    """nn.Conv(features, (3,3), padding=1)-compatible fast 3x3 conv.

    Identical parameter pytree ({kernel (3,3,Ci,Co), bias (Co,)}), so
    checkpoints and the torch converter are unaffected.  `impl` picks the
    compute path per call (resolved from cfg + train flag by the caller).
    """

    features: int
    use_bias: bool = True
    dtype: Optional[Any] = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, impl: str = "xla") -> jnp.ndarray:
        Ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, Ci, self.features), self.param_dtype,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        if impl == "shift":
            return conv3x3_shift(x, kernel, bias)
        if impl == "pallas":
            return conv3x3_pallas(x, kernel, bias)
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias.astype(dtype)
        return y


# ---------------------------------------------------------------------------
# X3 variant: dc taps folded into lanes, dr taps sublane-ALIGNED
# ---------------------------------------------------------------------------

def _conv_x3_kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, sems, *,
                    tm, wp, buf_rows, n_tiles, n_steps):
    bi = pl.program_id(0)
    ti = pl.program_id(1)
    step = bi * n_tiles + ti
    slot = jax.lax.rem(step, 2)

    def start(s, b2, t2):
        pltpu.make_async_copy(
            x_hbm.at[b2, pl.ds(t2 * tm, buf_rows), :],
            xbuf.at[s], sems.at[s],
        ).start()

    @pl.when(step == 0)
    def _():
        start(0, bi, ti)

    @pl.when(step + 1 < n_steps)
    def _():
        nxt = step + 1
        start(jax.lax.rem(nxt, 2), nxt // n_tiles, jax.lax.rem(nxt, n_tiles))

    pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(ti * tm, buf_rows), :], xbuf.at[slot],
        sems.at[slot],
    ).wait()

    acc = jnp.zeros(out_ref.shape[1:], jnp.float32)
    for dr in range(3):
        acc = acc + jnp.dot(
            xbuf[slot, pl.ds(dr * wp, tm), :], w_ref[dr],
            preferred_element_type=jnp.float32,
        )
    out_ref[0] = (acc + b_ref[0].astype(jnp.float32)).astype(out_ref.dtype)


def conv3x3_pallas_x3(x: jnp.ndarray, w: jnp.ndarray,
                      b: jnp.ndarray | None = None, block_rows: int = 6144,
                      interpret: bool = False) -> jnp.ndarray:
    """Aligned-tap Pallas conv: the horizontal (dc) taps are folded into
    the lane dimension by concatenating three row-shifted copies of the
    flattened padded image (X3[j] = [X[j], X[j+1], X[j+2]], 3*Ci lanes),
    and the image width is padded so the remaining vertical (dr) taps land
    on sublane-aligned offsets dr*Wp — the misaligned +-1 slices that
    forced relayouts in `conv3x3_pallas` disappear; the kernel is three
    aligned (tm, 3Ci) @ (3Ci, Co) MXU dots per tile.

    Same contract as conv3x3_shift / nn.Conv(features, (3,3), padding=1).
    """
    B, H, W, Ci = x.shape
    Co = w.shape[-1]
    w = w.astype(x.dtype)
    # pad width so Wp (and hence every dr*Wp tap offset) is 16-aligned
    Wp = -(-(W + 2) // 16) * 16
    extra = Wp - (W + 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + extra), (0, 0)))
    M0 = (H + 2) * Wp
    X = xp.reshape(B, M0, Ci)
    M = H * Wp  # output rows (garbage columns sliced at the end)

    # lane-concat of the three horizontal taps (one fused XLA copy)
    Xs = jnp.pad(X, ((0, 0), (0, 2), (0, 0)))
    X3 = jnp.concatenate(
        [Xs[:, 0:M0], Xs[:, 1:M0 + 1], Xs[:, 2:M0 + 2]], axis=-1
    )  # (B, M0, 3*Ci)
    # Mosaic requires dynamic-slice lane extents 128-aligned: pad 3*Ci
    C3 = 3 * Ci
    C3p = -(-C3 // 128) * 128
    if C3p != C3:
        X3 = jnp.pad(X3, ((0, 0), (0, 0), (0, C3p - C3)))

    tm = -(-min(block_rows, M) // 16) * 16
    n_tiles = -(-M // tm)
    buf_rows = tm + 2 * Wp
    rows_needed = n_tiles * tm + buf_rows
    if X3.shape[1] < rows_needed:
        X3 = jnp.pad(X3, ((0, 0), (0, rows_needed - X3.shape[1]), (0, 0)))
    w3 = w.reshape(3, 3 * Ci, Co)  # w3[dr] rows = [w[dr,0]; w[dr,1]; w[dr,2]]
    if C3p != C3:
        w3 = jnp.pad(w3, ((0, 0), (0, C3p - C3), (0, 0)))
    bias = (b if b is not None else jnp.zeros((Co,), jnp.float32))
    bias = bias.reshape(1, Co).astype(jnp.float32)

    n_steps = B * n_tiles
    out = pl.pallas_call(
        functools.partial(
            _conv_x3_kernel, tm=tm, wp=Wp, buf_rows=buf_rows,
            n_tiles=n_tiles, n_steps=n_steps,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * tm, Co), x.dtype),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, C3p, Co), lambda b2, t2: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda b2, t2: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tm, Co), lambda b2, t2: (b2, t2, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, buf_rows, C3p), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * M * 9 * Ci * Co,
            bytes_accessed=X3.size * X3.dtype.itemsize
            + B * M * Co * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(X3, w3, bias)
    return out[:, :M].reshape(B, H, Wp, Co)[:, :, :W]
