"""Resize / grid_sample ops vs torch.nn.functional golden outputs."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from occdepth_tpu.ops import (
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear,
    resize_nearest,
)


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("size", [(7, 9), (14, 20), (5, 31)])
def test_resize_bilinear_matches_torch(align_corners, size, rng):
    x = rng.randn(2, 10, 12, 3).astype(np.float32)
    out = resize_bilinear(jnp.asarray(x), size, align_corners)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="bilinear",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("size", [(20, 24), (376, 40)])
def test_resize_nearest_matches_torch(size, rng):
    x = rng.randn(1, 10, 12, 2).astype(np.float32)
    out = resize_nearest(jnp.asarray(x), size)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=size, mode="nearest",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_2d_matches_torch(padding_mode, rng):
    img = rng.randn(6, 8, 3).astype(np.float32)
    grid = rng.uniform(-1.4, 1.4, size=(5, 7, 2)).astype(np.float32)
    out = grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), padding_mode,
                         align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(img).permute(2, 0, 1)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode=padding_mode, align_corners=False,
    )[0].permute(1, 2, 0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_3d_matches_torch(padding_mode, rng):
    vol = rng.randn(6, 5, 8, 2).astype(np.float32)  # (D, H, W, C)
    grid = rng.uniform(-1.6, 1.6, size=(4, 3, 5, 3)).astype(np.float32)
    # sentinel out-of-bounds value used by the frustum generator
    grid[0, 0, 0] = -2.0
    out = grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid), padding_mode,
                         align_corners=False)
    ref = F.grid_sample(
        torch.from_numpy(vol).permute(3, 0, 1, 2)[None],
        torch.from_numpy(grid)[None],
        mode="bilinear", padding_mode=padding_mode, align_corners=False,
    )[0].permute(1, 2, 3, 0).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_flosp_gather_mean_and_sentinel(rng):
    from occdepth_tpu.ops.flosp_gather import flosp_gather

    x2d = rng.randn(4, 5, 3).astype(np.float32)
    idx = np.array([[0, 3, 20], [20, 20, 20]], np.int32)  # 20 == sentinel
    counts = np.array([2.0, 0.0], np.float32)
    out = np.asarray(flosp_gather(jnp.asarray(x2d), jnp.asarray(idx),
                                  jnp.asarray(counts)))
    flat = x2d.reshape(20, 3)
    np.testing.assert_allclose(out[0], (flat[0] + flat[3]) / 2, rtol=1e-6)
    np.testing.assert_array_equal(out[1], np.zeros(3))


def test_multiview_cosine_fuse_matches_reference_formula(rng):
    from occdepth_tpu.ops.flosp_gather import multiview_cosine_fuse

    N, C = 10, 4
    f = rng.randn(2, N, C).astype(np.float32)
    m = (rng.rand(2, N) > 0.3).astype(np.float32)
    f = f * m[..., None]  # invalid voxels are zero, like the gather output
    out = np.asarray(multiview_cosine_fuse(jnp.asarray(f), jnp.asarray(m)))

    # torch oracle replicating SFA.py:46-88
    tf = torch.from_numpy(f)
    tm = torch.from_numpy(m)
    cos = torch.cosine_similarity(tf[0], tf[1], dim=-1) * tm[0] * tm[1]
    w0 = cos + (tm[0] - tm[1] > 0).float()
    w1 = cos + (tm[1] - tm[0] > 0).float()
    ref = (w0[:, None] * tf[0] + w1[:, None] * tf[1]) / 2
    np.testing.assert_allclose(out, ref.numpy(), atol=1e-5)


def test_flosp_gather_flat_batched_matches_unrolled(rng):
    """unroll=False (batch-dim-preserving take_along_axis, the DP-sharded
    path) is bit-identical to the unrolled per-map takes."""
    from occdepth_tpu.ops.flosp_gather import flosp_gather_flat

    B, V, h, w, C, N, P = 3, 2, 6, 7, 4, 11, 3
    x2d = jnp.asarray(rng.randn(B, V, h, w, C).astype(np.float32))
    pix = jnp.asarray(
        np.stack(
            [rng.randint(0, w, (B, V, N, P)), rng.randint(0, h, (B, V, N, P))],
            axis=-1,
        ).astype(np.int32)
    )
    fov = jnp.asarray(rng.rand(B, V, N, P) > 0.4)
    f_u, v_u = flosp_gather_flat(x2d, pix, fov, unroll=True)
    f_b, v_b = flosp_gather_flat(x2d, pix, fov, unroll=False)
    np.testing.assert_array_equal(np.asarray(f_u), np.asarray(f_b))
    np.testing.assert_array_equal(np.asarray(v_u), np.asarray(v_b))
    # P=1 fast path too
    f_u1, v_u1 = flosp_gather_flat(x2d, pix[:, :, :, :1], fov[..., :1],
                                   unroll=True)
    f_b1, v_b1 = flosp_gather_flat(x2d, pix[:, :, :, :1], fov[..., :1],
                                   unroll=False)
    np.testing.assert_array_equal(np.asarray(f_u1), np.asarray(f_b1))
    np.testing.assert_array_equal(np.asarray(v_u1), np.asarray(v_b1))


def test_frustum_sample_lanes_batched_matches_unrolled(rng):
    from occdepth_tpu.ops.grid_sample import frustum_sample_lanes_batched

    G, D, H, W = 4, 5, 6, 7
    vol = jnp.asarray(rng.randn(G, D, H, W).astype(np.float32))
    grid = jnp.asarray((rng.rand(G, 3, 4, 5, 3) * 2.4 - 1.2).astype(np.float32))
    for ac in (False, True):
        out_u = frustum_sample_lanes_batched(vol, grid, ac, unroll=True)
        out_b = frustum_sample_lanes_batched(vol, grid, ac, unroll=False)
        np.testing.assert_array_equal(np.asarray(out_u), np.asarray(out_b))
