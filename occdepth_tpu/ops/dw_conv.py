"""Depthwise conv2d with a fast custom VJP (Pallas filter-gradient kernel).

XLA's autodiff for `feature_group_count=C` convs is the single hottest
pattern in the flagship train step's 2D-encoder backward (docs/DESIGN.md:
the filter gradient lowers to a degenerate conv that runs ~10x the forward;
reference backbone blocks occdepth/models/unet2d.py:238 via timm's
InvertedResidual).  The math, however, is tiny:

    dw[dr, dc, c] = sum_{b,h,w} x_pad[b, h+dr, w+dc, c] * g[b, h, w, c]

i.e. k*k elementwise multiply-reduces over the feature map — one read of x
and g if all taps are computed in one pass.  A pure-XLA formulation of this
was measured and rejected in round 2 (the +-dc sublane shifts force
relayout copies between ops); `dw_filter_grad_pallas` does the one-pass
version inside a single kernel where the shifted windows are VMEM slices:

  * grid over (batch, row-tiles of g); x row-slabs WITH their kh-1 halo
    rows are materialized once by XLA as a (B, n_tiles, tg+kh-1, Wx, C)
    array (~3% duplicated rows) and streamed by the BlockSpec pipeline —
    Mosaic's manual-DMA memref slices require the sublane dim 8-aligned
    and the lane dim 128-aligned (C=40 slabs are rejected), while pipeline
    blocks that span the full minor dims carry no such restriction;
  * the dr (row) shifts are slices along the untiled H axis of the slab;
    the dc (column) shifts ride `pltpu.roll` of the zero-padded fp32 g
    value (32-bit lane/sublane rotate, VMEM-local) instead of unaligned
    width slices, which Mosaic forbids on memrefs;
  * all kh*kw shifted products are accumulated in fp32 into a (kh*kw, C)
    output block that is revisited (constant index_map) across the
    sequential TPU grid.

`dw_conv2d` wraps the forward (unchanged XLA conv — it is already at
speed-of-light) with a custom VJP: dx is the spatially-flipped depthwise
conv of g (also fast in XLA), dw is the Pallas kernel.  Restricted to
stride 1 / dilation 1 / odd kernels — exactly the hot blocks; strided
blocks (one per stage) keep XLA's default VJP.

Numerics: the filter gradient is accumulated in fp32 (XLA's default VJP
materializes it in the conv compute dtype, i.e. bf16 under the bf16
policy) — a strict precision improvement, noted in PARITY.md.

Exactness coverage: tests/test_dw_conv.py pins the kernel in Pallas
interpret mode on CPU; the COMPILED Mosaic semantics this file depends on
(pltpu.roll direction on the lane axis, the revisited fp32 accumulator
block across the sequential grid) are checked against the fp32 oracle on
real hardware by `scripts/bench_dwconv.py --check` (run on v5e in the
round-5 session; result recorded in docs/DESIGN.md) — rerun that check
before flipping dw_conv_grad=pallas on a new jaxlib/Mosaic version.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dw_filter_grad_reference(x: jnp.ndarray, g: jnp.ndarray,
                             kh: int, kw: int) -> jnp.ndarray:
    """Oracle: filter grad of a stride-1 SAME depthwise conv, fp32.

    x (B, H, W, C), g (B, H, W, C) -> (kh, kw, 1, C) float32.
    """
    B, H, W, C = x.shape
    pt, pl_ = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pt, kh - 1 - pt), (pl_, kw - 1 - pl_), (0, 0)))
    xf = xp.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    taps = []
    for dr in range(kh):
        for dc in range(kw):
            xs = jax.lax.dynamic_slice(
                xf, (0, dr, dc, 0), (B, H, W, C)
            )
            taps.append(jnp.sum(xs * gf, axis=(0, 1, 2)))
    return jnp.stack(taps, 0).reshape(kh, kw, 1, C)


def _dwgrad_kernel(x_ref, g_ref, out_ref, *, tg, kh, kw):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # fp32 before the roll: tpu.rotate handles 32-bit data only
    g = g_ref[0, 0].astype(jnp.float32)  # (tg, Wx, C), zero beyond col W
    taps = [None] * (kh * kw)
    for dc in range(kw):
        # roll-right by dc: gd[w] = g[w-dc]; the wrapped-in columns are
        # the zero pad (Wx >= W + kw - 1), so the circular shift equals
        # the zero-padded shift
        gd = pltpu.roll(g, dc, axis=1) if dc else g
        for dr in range(kh):
            xs = x_ref[0, 0, dr:dr + tg, :, :].astype(jnp.float32)
            taps[dr * kw + dc] = jnp.sum(xs * gd, axis=(0, 1))  # (C,)
    out_ref[:] += jnp.stack(taps, 0)


def dw_filter_grad_pallas(
    x: jnp.ndarray, g: jnp.ndarray, kh: int, kw: int,
    target_slab_bytes: int = 1 << 20, interpret: bool = False,
) -> jnp.ndarray:
    """Fused one-pass filter gradient (stride 1, SAME, dilation 1).

    Same contract as `dw_filter_grad_reference`.
    """
    B, H, W, C = x.shape
    assert g.shape == (B, H, W, C), (x.shape, g.shape)
    pt, pl_ = (kh - 1) // 2, (kw - 1) // 2
    # sublane (width) axis of every DMA'd block must be 8-aligned; pad the
    # SAME-padded width up to it (the extra zero columns multiply zero-padded
    # g columns, so they contribute nothing)
    Wx = -(-(W + kw - 1) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (pt, kh - 1 - pt),
                     (pl_, Wx - W - pl_), (0, 0)))

    row_bytes = Wx * C * x.dtype.itemsize
    tg = max(8, min(H, target_slab_bytes // max(1, row_bytes)))
    n_tiles = -(-H // tg)
    buf_rows = tg + kh - 1
    rows_needed = (n_tiles - 1) * tg + buf_rows
    if xp.shape[1] < rows_needed:
        xp = jnp.pad(xp, ((0, 0), (0, rows_needed - xp.shape[1]),
                          (0, 0), (0, 0)))
    # overlapping row slabs (halo included), one XLA copy (~kh/tg extra)
    slabs = jnp.stack(
        [jax.lax.slice_in_dim(xp, t * tg, t * tg + buf_rows, axis=1)
         for t in range(n_tiles)], 1,
    )  # (B, n_tiles, buf_rows, Wx, C)
    gp = jnp.pad(g, ((0, 0), (0, n_tiles * tg - H), (0, Wx - W), (0, 0)))
    gp = gp.reshape(B, n_tiles, tg, Wx, C)

    out = pl.pallas_call(
        functools.partial(_dwgrad_kernel, tg=tg, kh=kh, kw=kw),
        out_shape=jax.ShapeDtypeStruct((kh * kw, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, buf_rows, Wx, C),
                         lambda b2, t2: (b2, t2, 0, 0, 0)),
            pl.BlockSpec((1, 1, tg, Wx, C),
                         lambda b2, t2: (b2, t2, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((kh * kw, C), lambda b2, t2: (0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * kh * kw,
            bytes_accessed=(slabs.size * slabs.dtype.itemsize
                            + gp.size * gp.dtype.itemsize),
            transcendentals=0,
        ),
        # the kh*kw fp32 tap products can be scheduled concurrently; give
        # the kernel headroom past the default 16M scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(slabs, gp)
    return out.reshape(kh, kw, 1, C)


# ---------------------------------------------------------------------------
# custom-VJP depthwise conv (stride 1, SAME, odd kernel)
# ---------------------------------------------------------------------------

def _dw_fwd_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def dw_conv2d_fastgrad(x: jnp.ndarray, w: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Stride-1 SAME depthwise conv; forward == lax conv, backward fused.

    x (B, H, W, C), w (kh, kw, 1, C) in the compute dtype (caller casts,
    matching nn.Conv's promote_dtype semantics).
    """
    del interpret
    return _dw_fwd_conv(x, w)


def _dw_fwd(x, w, interpret):
    return _dw_fwd_conv(x, w), (x, w)


def _dw_bwd(interpret, res, g):
    x, w = res
    kh, kw = w.shape[0], w.shape[1]
    # dx: depthwise conv of g with the spatially flipped filter (exact for
    # odd kernels under SAME: the transposed padding equals SAME padding)
    dx = jax.lax.conv_general_dilated(
        g, w[::-1, ::-1], (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(x.dtype)
    dw = dw_filter_grad_pallas(x, g, kh, kw, interpret=interpret)
    return dx, dw.astype(w.dtype)


dw_conv2d_fastgrad.defvjp(_dw_fwd, _dw_bwd)


def use_fast_dw_grad(mode: str, kernel: int, stride: int) -> bool:
    """Resolve the dw-conv VJP path.  `mode` is cfg.dw_conv_grad:
    'pallas' forces the fused kernel for eligible convs, 'xla' disables
    it, 'auto' currently resolves to 'xla' everywhere: isolated the
    kernel halves the dw-grad cost (3.63 -> 1.80 ms/view on v5e), but
    end-to-end the flagship train step measured 221.3 vs 197.1 ms — the
    26 pallas_call boundaries cost more scheduling/fusion freedom than
    the kernel saves (docs/DESIGN.md round 4)."""
    if mode not in ("pallas", "xla", "auto"):
        raise ValueError(
            f"dw_conv_grad={mode!r}: expected 'pallas', 'xla' or 'auto'"
        )
    if stride != 1 or kernel % 2 != 1:
        return False
    return mode == "pallas"
