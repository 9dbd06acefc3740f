"""Fused FLoSP gather: lift a 2D feature map into per-voxel features.

TPU-native replacement for the reference SFA gather loop
(occdepth/models/SFA.py:17-43): for every voxel, gather its precomputed
pattern pixels from the (padded) 2D map and average over the in-FOV ones.

The 2D map is flattened to (HW + 1, C) with a zero sentinel row; indices of
out-of-FOV pattern points equal HW, so the gather itself needs no branch —
exactly the reference's `torch.cat([src, zeros], 1)` trick, but vectorized
over pattern points and views instead of a python loop.

Measured (v5e, bench_gather2): XLA's TPU gather is fast only below a size
cliff — 262k rows from a (451k, 32) bf16 table takes 0.11 ms, but doubling
EITHER the index count or the table rows costs 12-25x (2N from 2R: 5.3 ms),
and a gather with batch dims (what vmap produces) is equally bad.  So
`flosp_gather_flat` statically unrolls the (batch, view) maps into
independent single-map takes — each stays under the cliff — instead of
vmapping or folding everything into one giant table.
"""
from __future__ import annotations

import jax.numpy as jnp


def flosp_gather(
    x2d: jnp.ndarray, indices: jnp.ndarray, counts: jnp.ndarray
) -> jnp.ndarray:
    """Gather-and-average pattern pixels for each voxel (single map).

    Args:
        x2d: (H, W, C) feature map.
        indices: (N, P) int32 flat pixel indices, H*W = zero sentinel.
        counts: (N,) float32 number of in-FOV pattern points per voxel.

    Returns:
        (N, C) per-voxel features; voxels with count 0 are exactly 0
        (reference SFA.py:32-41: divide then NaN->0).
    """
    H, W, C = x2d.shape
    flat = x2d.reshape(H * W, C)
    flat = jnp.concatenate([flat, jnp.zeros((1, C), flat.dtype)], axis=0)
    gathered = jnp.take(flat, indices, axis=0)  # (N, P, C) in input dtype
    total = gathered.astype(jnp.float32).sum(axis=1)  # (N, C)
    denom = jnp.where(counts > 0, counts, 1.0)[:, None]
    return jnp.where(counts[:, None] > 0, total / denom, 0.0)


def flosp_gather_flat(
    x2d: jnp.ndarray,  # (B, V, h, w, C)
    pix: jnp.ndarray,  # (B, V, N, P, 2) int pixel coords at this scale
    fov_mask: jnp.ndarray,  # (B, V, N, P) bool
    unroll: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather every (batch, view) map's pattern pixels and mean over in-FOV
    points.

    With ``unroll=True`` (single-device default) one `jnp.take` is issued
    per (b, v) map — unrolled below the XLA TPU gather size cliff (see
    docs/DESIGN.md), not one flat take.  With ``unroll=False`` the gather
    is a single batch-dim-preserving `take_along_axis`: required under a
    data-sharded batch, where slicing `x2d[b]` would cross device shards
    and GSPMD would insert hundreds of collective-permutes (cfg
    `unroll_gathers`; both paths are bit-identical, tests/test_ops.py).

    Returns ((B, V, N, C) float32 per-voxel means, (B, V, N) float32 valid).
    """
    B, V, h, w, C = x2d.shape
    N, P = pix.shape[2], pix.shape[3]
    idx = pix[..., 1] * w + pix[..., 0]  # (B, V, N, P)
    idx = jnp.where(fov_mask, idx, h * w).astype(jnp.int32)

    if unroll:
        per_map = []
        for b in range(B):
            for v in range(V):
                flat = x2d[b, v].reshape(h * w, C)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((1, C), flat.dtype)], axis=0)
                per_map.append(
                    jnp.take(flat, idx[b, v].reshape(-1), axis=0)
                )
        gathered = jnp.stack(per_map).reshape(B, V, N, P, C)
    else:
        tables = x2d.reshape(B, V, h * w, C)
        tables = jnp.concatenate(
            [tables, jnp.zeros((B, V, 1, C), tables.dtype)], axis=2
        )
        gathered = jnp.take_along_axis(
            tables, idx.reshape(B, V, N * P, 1), axis=2
        ).reshape(B, V, N, P, C)
    if P == 1:
        # single-point pattern (pattern_id 0, the flagship): the mean over
        # in-FOV points is the gathered value itself (sentinel rows are
        # exact zeros), so no counts/divide arithmetic is needed
        feats = gathered[:, :, :, 0].astype(jnp.float32)
        valid = fov_mask[..., 0].astype(jnp.float32)
        return feats, valid
    total = gathered.astype(jnp.float32).sum(axis=3)  # (B, V, N, C)
    counts = fov_mask.sum(axis=-1).astype(jnp.float32)  # (B, V, N)
    denom = jnp.where(counts > 0, counts, 1.0)[..., None]
    feats = jnp.where(counts[..., None] > 0, total / denom, 0.0)
    valid = (counts > 0).astype(feats.dtype)
    return feats, valid


def multiview_cosine_fuse(
    feats: jnp.ndarray, valid: jnp.ndarray, eps: float = 1e-8,
    use_pallas: bool = False,
) -> jnp.ndarray:
    """Stereo-SFA cross-view fusion with cosine-similarity weights.

    Reference SFA.py:46-88: for each view pair (i, j), voxels seen by both
    views are weighted by the cosine similarity of their per-view features;
    voxels seen by only one view keep that view's feature (weight 1).

    Args:
        feats: (V, N, C) per-view voxel features.
        valid: (V, N) float32 in {0, 1} — 1 where the voxel is in view's FOV.

    Returns:
        (N, C) fused features.
    """
    V = feats.shape[0]
    if V == 1:
        return feats[0]

    if V == 2 and use_pallas:
        from occdepth_tpu.ops.pallas_kernels import stereo_cosine_fuse

        return stereo_cosine_fuse(
            feats[0], feats[1], valid[0], valid[1], eps
        )

    out = jnp.zeros_like(feats[0])
    for i in range(V):
        for j in range(i + 1, V):
            fi, fj = feats[i], feats[j]
            mi, mj = valid[i], valid[j]
            both = mi * mj
            # torch.cosine_similarity(fi, fj, dim=C) with its eps clamp
            ni = jnp.maximum(jnp.linalg.norm(fi, axis=-1), eps)
            nj = jnp.maximum(jnp.linalg.norm(fj, axis=-1), eps)
            cos = (fi * fj).sum(axis=-1) / (ni * nj) * both
            wi = cos + (mi - mj > 0).astype(feats.dtype)
            wj = cos + (mj - mi > 0).astype(feats.dtype)
            out = out + wi[:, None] * fi + wj[:, None] * fj
    return out / (V * (V - 1))
