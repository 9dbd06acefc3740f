"""Conv3DFast == native XLA conv3d == torch Conv3d, for all model variants."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from occdepth_tpu.ops.conv3d_fast import conv3d_decomposed


@pytest.mark.parametrize(
    "kernel,stride,pad,dil",
    [
        ((3, 3, 3), (1, 1, 1), (1, 1, 1), (1, 1, 1)),
        ((3, 3, 3), (1, 1, 1), (2, 2, 2), (2, 2, 2)),  # ASPP dilated
        ((3, 3, 3), (2, 2, 2), (1, 1, 1), (1, 1, 1)),  # mega_context
        ((1, 1, 3), (1, 1, 2), (0, 0, 1), (1, 1, 1)),  # DDR factorized
        ((3, 1, 1), (2, 1, 1), (1, 0, 0), (1, 1, 1)),
        ((1, 3, 1), (1, 1, 1), (0, 3, 0), (1, 3, 1)),
    ],
)
def test_conv3d_decomposed_matches_torch(kernel, stride, pad, dil, rng):
    I, O = 4, 6
    x = rng.randn(2, 8, 7, 9, I).astype(np.float32)
    tconv = nn.Conv3d(I, O, kernel, stride=stride, padding=pad, dilation=dil,
                      bias=False)
    ref = tconv(torch.from_numpy(x.transpose(0, 4, 1, 2, 3))).detach().numpy()

    k = tconv.weight.detach().numpy().transpose(2, 3, 4, 1, 0)
    out = conv3d_decomposed(
        jnp.asarray(x), jnp.asarray(k), stride,
        tuple((p, p) for p in pad), dil,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=2e-4
    )
