"""Exactness of the shifted-matmul 3x3 conv (XLA + Pallas-interpret) vs
jax.lax.conv — the oracle the 2D decoder's convs must match bit-for-bit
within fp32 rounding (ops/conv2d_shift.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.ops.conv2d_shift import conv3x3_pallas, conv3x3_shift

SHAPES = [
    (1, 13, 17, 5, 7),
    (2, 16, 32, 8, 4),
    (1, 37, 61, 3, 9),
]


def _oracle(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b


@pytest.mark.parametrize("shape", SHAPES)
def test_conv3x3_shift_matches_conv(shape, rng):
    B, H, W, Ci, Co = shape
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32)
    b = jnp.asarray(rng.randn(Co), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(conv3x3_shift(x, w, b)), np.asarray(_oracle(x, w, b)),
        atol=1e-4, rtol=1e-5,
    )


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("block_rows", [128, 4096])
def test_conv3x3_pallas_interpret_matches_conv(shape, block_rows, rng):
    B, H, W, Ci, Co = shape
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32)
    b = jnp.asarray(rng.randn(Co), jnp.float32)
    got = conv3x3_pallas(x, w, b, block_rows=block_rows, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, w, b)), atol=1e-4, rtol=1e-5,
    )


def test_conv3x3_shift_grad_matches_conv(rng):
    """The shift formulation must be differentiable (it is used inside the
    train step when enabled): grads vs the conv oracle."""
    B, H, W, Ci, Co = 1, 9, 11, 4, 6
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32)
    b = jnp.asarray(rng.randn(Co), jnp.float32)
    g1 = jax.grad(lambda xx, ww: jnp.sum(conv3x3_shift(xx, ww, b) ** 2),
                  argnums=(0, 1))(x, w)
    g2 = jax.grad(lambda xx, ww: jnp.sum(_oracle(xx, ww, b) ** 2),
                  argnums=(0, 1))(x, w)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("shape", SHAPES)
def test_conv3x3_pallas_x3_interpret_matches_conv(shape, rng):
    """Aligned-tap X3 variant (dc taps in lanes): exact vs the conv oracle."""
    from occdepth_tpu.ops.conv2d_shift import conv3x3_pallas_x3

    B, H, W, Ci, Co = shape
    x = jnp.asarray(rng.randn(B, H, W, Ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), jnp.float32)
    b = jnp.asarray(rng.randn(Co), jnp.float32)
    got = conv3x3_pallas_x3(x, w, b, block_rows=128, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_oracle(x, w, b)), atol=1e-4, rtol=1e-5,
    )
