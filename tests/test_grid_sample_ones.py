"""Analytic ones-volume sample == gather-based grid_sample of ones."""
import numpy as np

import jax.numpy as jnp

from occdepth_tpu.ops.grid_sample import grid_sample_3d, grid_sample_3d_ones


def test_frustum_sample_lanes_matches_gather(rng):
    from occdepth_tpu.ops.grid_sample import frustum_sample_lanes

    D, H, W = 9, 5, 8
    vol = rng.randn(D, H, W).astype(np.float32)
    grid = rng.uniform(-1.8, 1.8, size=(7, 4, 3, 3)).astype(np.float32)
    grid[0, 0, 0] = -2.0
    ref = grid_sample_3d(jnp.asarray(vol)[..., None], jnp.asarray(grid),
                         "zeros", align_corners=False)[..., 0]
    out = frustum_sample_lanes(jnp.asarray(vol), jnp.asarray(grid),
                               align_corners=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ones_weight_matches_gather(rng):
    D, H, W = 6, 5, 8
    grid = rng.uniform(-1.8, 1.8, size=(7, 4, 3, 3)).astype(np.float32)
    grid[0, 0, 0] = -2.0  # out-of-bounds sentinel
    ones = jnp.ones((D, H, W, 1))
    ref = grid_sample_3d(ones, jnp.asarray(grid), "zeros",
                         align_corners=False)[..., 0]
    out = grid_sample_3d_ones((D, H, W), jnp.asarray(grid),
                              align_corners=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
