"""End-to-end SFA lifting vs a torch oracle of the reference math.

Covers the whole chain per scale: scale-divided pattern-pixel gather with
the zero-sentinel column, in-FOV mean with NaN->0, cross-view cosine
weighting, sum over scales, and the dataset-specific reshape
(reference SFA.py:12-106 + OccDepth._forward_2d_to_3d scale loop).
"""
import numpy as np
import torch

import jax.numpy as jnp

from occdepth_tpu.models.sfa import sfa_lift


def torch_sfa_one_scale(x2d, pix, fov, scale):
    """(V, h, w, C) features + full-res pattern pixels -> (V, N, C), (V, N)."""
    V, h, w, C = x2d.shape
    feats, weights = [], []
    for v in range(V):
        src = torch.from_numpy(
            x2d[v].reshape(-1, C).T.copy()
        )  # (C, hw) like reference's view(c, -1)
        src = torch.cat([src, torch.zeros(C, 1)], dim=1)
        p = torch.from_numpy(pix[v] // scale if scale > 1 else pix[v])
        m = torch.from_numpy(fov[v])
        idx = p[..., 1] * w + p[..., 0]
        wts = torch.where(m, torch.ones_like(idx), torch.zeros_like(idx))
        idx = torch.where(m, idx, torch.full_like(idx, h * w))
        gathered = None
        for k in range(idx.shape[1]):
            g = torch.gather(src, 1, idx[:, k].expand(C, -1))
            gathered = g if gathered is None else gathered + g
        cnt = wts.sum(1)
        f = gathered / cnt
        f = torch.where(torch.isnan(f), torch.zeros_like(f), f)
        mvalid = cnt / cnt
        mvalid = torch.where(torch.isnan(mvalid), torch.zeros_like(mvalid),
                             mvalid)
        feats.append(f)  # (C, N)
        weights.append(mvalid)
    return feats, weights


def torch_sfa_fuse(feats, weights):
    V = len(feats)
    if V == 1:
        return feats[0]
    out = torch.zeros_like(feats[0])
    for i in range(V):
        for j in range(i + 1, V):
            wij = weights[i] * weights[j]
            cos = torch.cosine_similarity(feats[i], feats[j], 0) * wij
            wi = cos + (weights[i] - weights[j] > 0).float()
            wj = cos + (weights[j] - weights[i] > 0).float()
            out = out + wi * feats[i] + wj * feats[j]
    return out / (V * (V - 1))


def test_sfa_lift_matches_torch_oracle(rng):
    X, Y, Z = 8, 8, 4
    N = X * Y * Z
    V, P = 2, 3
    H, W = 24, 32  # full-res image dims (scales 1 and 2)
    scales = (1, 2)

    x_rgb = {}
    x2d_np = {}
    for s in scales:
        h, w = -(-H // s), -(-W // s)
        a = rng.randn(1, V, h, w, 5).astype(np.float32)
        x_rgb[f"1_{s}"] = jnp.asarray(a)
        x2d_np[s] = a[0]

    pix = rng.randint(-3, 40, size=(V, N, P, 2)).astype(np.int32)
    fov = (
        (pix[..., 0] >= 0) & (pix[..., 0] < W)
        & (pix[..., 1] >= 0) & (pix[..., 1] < H)
        & (rng.rand(V, N, P) > 0.2)
    )

    out = sfa_lift(
        x_rgb, jnp.asarray(pix)[None], jnp.asarray(fov)[None],
        scales, (X, Y, Z), "kitti",
    )

    total = None
    for s in scales:
        feats, wts = torch_sfa_one_scale(x2d_np[s], pix, fov, s)
        fused = torch_sfa_fuse(feats, wts)  # (C, N)
        total = fused if total is None else total + fused
    ref = total.numpy().T.reshape(X, Y, Z, 5)
    np.testing.assert_allclose(np.asarray(out[0]), ref, atol=1e-4)
