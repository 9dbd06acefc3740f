"""Exactness of the lane-folded conv3d formulations (ops/zfold_conv.py).

These are measured ALTERNATIVES to conv3d_decomposed (see docs/DESIGN.md:
the dense-banded fold trades Z/kz extra MXU flops for full lane utilization
and lost on v5e; the grouped form hits XLA's grouped-conv cliff).  They are
kept exact and tested so future hardware/compiler generations can re-try
them with one import.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.ops.conv3d_fast import conv3d_decomposed
from occdepth_tpu.ops.zfold_conv import (
    band_weights,
    zfold_conv3d,
    zfold_conv3d_grouped,
)

PAD3 = ((1, 1), (1, 1), (1, 1))
PAD2 = ((1, 1), (1, 1))


@pytest.mark.parametrize("Z,Ci,Co", [(8, 4, 4), (6, 3, 5)])
def test_zfold_matches_decomposed(Z, Ci, Co):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (2, 7, 9, Z, Ci), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 3, Ci, Co), jnp.float32) * 0.1
    ref = conv3d_decomposed(x, w, (1, 1, 1), PAD3, (1, 1, 1))
    np.testing.assert_allclose(
        np.asarray(zfold_conv3d(x, w, PAD2)), np.asarray(ref),
        rtol=0, atol=2e-6,
    )
    np.testing.assert_allclose(
        np.asarray(zfold_conv3d_grouped(x, w, PAD2)), np.asarray(ref),
        rtol=0, atol=2e-6,
    )


def test_band_weights_structure():
    Z, Ci, Co = 5, 2, 3
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, Ci, Co))
    w = np.asarray(band_weights(k, Z))
    assert w.shape == (3, 3, Z * Ci, Z * Co)
    kn = np.asarray(k)
    for zi in range(Z):
        for zo in range(Z):
            blk = w[:, :, zi * Ci:(zi + 1) * Ci, zo * Co:(zo + 1) * Co]
            if abs(zi - zo) > 1:
                assert not blk.any()
            else:
                np.testing.assert_array_equal(blk, kn[:, :, zi - zo + 1])
