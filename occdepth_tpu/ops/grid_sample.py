"""grid_sample with exact torch.nn.functional.grid_sample semantics.

The OAD frustum->voxel resample (reference f2v/sampler.py:59-64, called from
flosp_depth.py:574-577) is `F.grid_sample(bilinear, zeros padding,
align_corners=False)` in 3D; the virtual-stereo view synthesis
(OccDepth.py:258) is the 2D variant with border padding.  Checkpoint parity
requires matching the align_corners=False unnormalization
`ix = ((x + 1) * W - 1) / 2` and the corner-masking of zero padding
bit-for-bit, so these are hand-rolled here (channels-last, jittable,
differentiable; the trilinear path is the one Pallas later fuses).
"""
from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """img (H, W, C), iy/ix int (...,) -> (..., C) via flat take."""
    H, W, C = img.shape
    flat = img.reshape(H * W, C)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def grid_sample_2d(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear 2D grid sample.

    Args:
        img: (H, W, C) input feature map.
        grid: (..., 2) normalized coords, last dim (x, y) in [-1, 1].
        padding_mode: "zeros" | "border".

    Returns (..., C).
    """
    H, W, _ = img.shape
    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0

    out = None
    imgf = img.astype(jnp.float32)
    for dy, wyc in ((0, 1.0 - wy), (1, wy)):
        for dx, wxc in ((0, 1.0 - wx), (1, wx)):
            cx = x0 + dx
            cy = y0 + dy
            if padding_mode == "zeros":
                valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
                w = jnp.where(valid, wxc * wyc, 0.0)
            else:
                w = wxc * wyc
            gx = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            gy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
            val = _gather_2d(imgf, gy, gx) * w[..., None]
            out = val if out is None else out + val
    return out.astype(img.dtype)


def frustum_sample_lanes(
    vol: jnp.ndarray,  # (D, H, W) scalar frustum volume
    grid: jnp.ndarray,  # (..., 3) normalized (x->W, y->H, z->D)
    align_corners: bool = False,
) -> jnp.ndarray:
    """Trilinear zero-padded sample of a SCALAR volume, depth in lanes.

    Bit-equivalent to `grid_sample_3d(vol[..., None], grid, "zeros")[..., 0]`
    but restructured for TPU: the (H, W) bilinear part gathers 4 rows of a
    (H*W, D) table (D in the 128-lane dimension), and the D-linear part is
    a one-hot weighted lane reduction — no scalar-row gathers.  This is the
    hot resample of the OAD branch (frustum depth volume -> voxel grid).
    """
    D, H, W = vol.shape
    table = vol.transpose(1, 2, 0).reshape(H * W, D)

    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    iz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)
    shape = ix.shape
    ix = ix.reshape(-1)
    iy = iy.reshape(-1)
    iz = iz.reshape(-1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    wx = ix - x0
    wy = iy - y0
    wz = iz - z0

    acc = None
    for dy, wyc in ((0, 1.0 - wy), (1, wy)):
        for dx, wxc in ((0, 1.0 - wx), (1, wx)):
            cx = x0 + dx
            cy = y0 + dy
            valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            w = jnp.where(valid, wxc * wyc, 0.0)
            gx = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            gy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
            rows = jnp.take(table, gy * W + gx, axis=0)  # (N, D)
            contrib = rows * w[:, None]
            acc = contrib if acc is None else acc + contrib

    # linear interpolation over the lane (depth-bin) dimension via a
    # two-nonzero selection mask
    d_iota = jnp.arange(D, dtype=jnp.float32)[None, :]
    z0c = z0[:, None]
    lo_ok = ((z0c >= 0) & (z0c <= D - 1)).astype(jnp.float32)
    hi_ok = ((z0c + 1 >= 0) & (z0c + 1 <= D - 1)).astype(jnp.float32)
    sel = (
        (d_iota == jnp.clip(z0c, 0, D - 1)) * (1.0 - wz[:, None]) * lo_ok
        + (d_iota == jnp.clip(z0c + 1, 0, D - 1)) * wz[:, None] * hi_ok
    )
    out = (acc * sel).sum(axis=-1)
    return out.reshape(shape)


def frustum_sample_lanes_batched(
    vol: jnp.ndarray,  # (G, D, H, W) scalar frustum volumes
    grid: jnp.ndarray,  # (G, ..., 3) normalized (x->W, y->H, z->D)
    align_corners: bool = False,
    unroll: bool = True,
) -> jnp.ndarray:
    """`frustum_sample_lanes` for G maps, gathers statically unrolled.

    Bit-equivalent to `jax.vmap(frustum_sample_lanes)(vol, grid)`, but the
    row gathers are issued per map: XLA's TPU gather has a hard size cliff —
    batched gathers (vmap) and takes whose index count exceeds ~262k rows
    are 12-25x slower than the same rows fetched as independent single-map
    takes (measured v5e, bench_gather2).

    ``unroll=False`` keeps the G (batch*views) dim intact and gathers with
    one `take_along_axis` instead: mandatory when G is data-sharded —
    slicing `tables[g]` across shards makes GSPMD emit per-map
    collective-permutes (cfg `unroll_gathers`).  Both paths bit-identical
    (tests/test_ops.py).
    """
    G, D, H, W = vol.shape
    tables = vol.transpose(0, 2, 3, 1).reshape(G, H * W, D)

    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    iz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)
    shape = ix.shape  # (G, ...)
    M = int(ix.size // G)
    ix = ix.reshape(G, M)
    iy = iy.reshape(G, M)
    iz = iz.reshape(G, M)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    wx = ix - x0
    wy = iy - y0
    wz = iz - z0

    acc = None
    for dy, wyc in ((0, 1.0 - wy), (1, wy)):
        for dx, wxc in ((0, 1.0 - wx), (1, wx)):
            cx = x0 + dx
            cy = y0 + dy
            valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
            w = jnp.where(valid, wxc * wyc, 0.0)
            gx = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
            gy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
            idx = gy * W + gx  # (G, M)
            if unroll:
                rows = jnp.stack([
                    jnp.take(tables[g], idx[g], axis=0) for g in range(G)
                ])  # (G, M, D)
            else:
                rows = jnp.take_along_axis(
                    tables, idx[..., None], axis=1
                )  # (G, M, D)
            contrib = rows * w[..., None]
            acc = contrib if acc is None else acc + contrib

    # linear interpolation over the lane (depth-bin) dimension via a
    # two-nonzero selection mask
    d_iota = jnp.arange(D, dtype=jnp.float32)[None, None, :]
    z0c = z0[..., None]
    lo_ok = ((z0c >= 0) & (z0c <= D - 1)).astype(jnp.float32)
    hi_ok = ((z0c + 1 >= 0) & (z0c + 1 <= D - 1)).astype(jnp.float32)
    sel = (
        (d_iota == jnp.clip(z0c, 0, D - 1)) * (1.0 - wz[..., None]) * lo_ok
        + (d_iota == jnp.clip(z0c + 1, 0, D - 1)) * wz[..., None] * hi_ok
    )
    out = (acc * sel).sum(axis=-1)
    return out.reshape(shape)


def grid_sample_3d_ones(
    vol_shape,
    grid: jnp.ndarray,
    align_corners: bool = False,
) -> jnp.ndarray:
    """Trilinear zero-padded sample of an all-ones volume — analytically.

    sample(ones)[p] = sum over the 8 corners of w_corner * in_bounds(corner),
    so no gather is needed.  Bit-equivalent to
    `grid_sample_3d(jnp.ones(vol_shape + (1,)), grid, "zeros", ac)[..., 0]`
    (used for the OAD multi-cam mean mask, reference flosp_depth.py:578-586).
    """
    D, H, W = vol_shape
    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    iz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    wx = ix - x0
    wy = iy - y0
    wz = iz - z0

    def axis_w(c0, w, size):
        lo_ok = ((c0 >= 0) & (c0 <= size - 1)).astype(jnp.float32)
        hi_ok = ((c0 + 1 >= 0) & (c0 + 1 <= size - 1)).astype(jnp.float32)
        return (1.0 - w) * lo_ok + w * hi_ok

    return (
        axis_w(x0, wx, W) * axis_w(y0, wy, H) * axis_w(z0, wz, D)
    )


def grid_sample_3d(
    vol: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Trilinear 3D grid sample.

    Args:
        vol: (D, H, W, C) input volume (for OAD: D=depth bins, H/W=feature map).
        grid: (..., 3) normalized coords, last dim (x->W, y->H, z->D).
        padding_mode: "zeros" | "border".

    Returns (..., C).
    """
    D, H, W, C = vol.shape
    ix = _unnormalize(grid[..., 0].astype(jnp.float32), W, align_corners)
    iy = _unnormalize(grid[..., 1].astype(jnp.float32), H, align_corners)
    iz = _unnormalize(grid[..., 2].astype(jnp.float32), D, align_corners)

    if padding_mode == "border":
        ix = jnp.clip(ix, 0.0, W - 1)
        iy = jnp.clip(iy, 0.0, H - 1)
        iz = jnp.clip(iz, 0.0, D - 1)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    z0 = jnp.floor(iz)
    wx = ix - x0
    wy = iy - y0
    wz = iz - z0

    volf = vol.astype(jnp.float32).reshape(D * H * W, C)
    out = None
    for dz, wzc in ((0, 1.0 - wz), (1, wz)):
        for dy, wyc in ((0, 1.0 - wy), (1, wy)):
            for dx, wxc in ((0, 1.0 - wx), (1, wx)):
                cx = x0 + dx
                cy = y0 + dy
                cz = z0 + dz
                w = wxc * wyc * wzc
                if padding_mode == "zeros":
                    valid = (
                        (cx >= 0) & (cx <= W - 1)
                        & (cy >= 0) & (cy <= H - 1)
                        & (cz >= 0) & (cz <= D - 1)
                    )
                    w = jnp.where(valid, w, 0.0)
                gx = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
                gy = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
                gz = jnp.clip(cz, 0, D - 1).astype(jnp.int32)
                idx = (gz * H + gy) * W + gx
                val = jnp.take(volf, idx, axis=0) * w[..., None]
                out = val if out is None else out + val
    return out.astype(vol.dtype)
