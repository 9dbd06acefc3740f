"""Pallas kernels vs their jnp references (interpret mode on CPU)."""
import numpy as np

import jax.numpy as jnp

from occdepth_tpu.ops.pallas_kernels import (
    crp_relation_matmul,
    crp_relation_matmul_reference,
    stereo_cosine_fuse,
    stereo_cosine_fuse_reference,
)


def test_crp_matmul_interpret(rng):
    N, M, C = 1024, 256, 64
    p = rng.randn(N, M).astype(np.float32)
    mega = rng.randn(M, C).astype(np.float32)
    out = crp_relation_matmul(jnp.asarray(p), jnp.asarray(mega),
                              block_n=256, interpret=True)
    ref = crp_relation_matmul_reference(jnp.asarray(p), jnp.asarray(mega))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_crp_matmul_fallback_on_ragged():
    # non-divisible N falls back to the reference implementation
    p = jnp.ones((100, 128))
    mega = jnp.ones((128, 8))
    out = crp_relation_matmul(p, mega, block_n=512)
    ref = crp_relation_matmul_reference(p, mega)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_stereo_fuse_interpret(rng):
    N, C = 4096, 32
    f0 = rng.randn(N, C).astype(np.float32)
    f1 = rng.randn(N, C).astype(np.float32)
    m0 = (rng.rand(N) > 0.3).astype(np.float32)
    m1 = (rng.rand(N) > 0.3).astype(np.float32)
    f0 *= m0[:, None]
    f1 *= m1[:, None]
    out = stereo_cosine_fuse(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(m0), jnp.asarray(m1),
        block_n=1024, interpret=True,
    )
    ref = stereo_cosine_fuse_reference(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(m0), jnp.asarray(m1)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
