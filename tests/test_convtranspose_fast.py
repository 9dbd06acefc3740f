"""ConvTranspose3DFast == torch ConvTranspose3d (stride 1 and 2)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from occdepth_tpu.ops.conv3d_fast import conv_transpose3d_decomposed
from occdepth_tpu.training.convert_torch import _convT3d


@pytest.mark.parametrize("stride,outpad,pad", [(2, 1, 1), (1, 0, 1)])
def test_convtranspose3d_fast_matches_torch(stride, outpad, pad, rng):
    tconv = nn.ConvTranspose3d(4, 6, 3, stride=stride, padding=pad,
                               output_padding=outpad, bias=False)
    x = torch.randn(1, 4, 4, 5, 6)
    ref = tconv(x).detach().numpy()

    lo = 3 - 1 - pad
    hi = 3 - 1 - pad + outpad
    k = _convT3d(tconv.weight.detach().numpy())  # (k..., O, I)
    out = conv_transpose3d_decomposed(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 4, 1)), jnp.asarray(k),
        (stride,) * 3, ((lo, hi),) * 3,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 4, 1, 2, 3), ref, atol=1e-4
    )
