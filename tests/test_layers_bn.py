"""_BNCore (remat BatchNorm) is bit-identical to flax nn.BatchNorm.

layers.BatchNorm / efficientnet.TfBatchNorm hand-roll BN so the backward
rematerializes the fp32 cast+stats+normalize instead of storing an fp32
copy of every activation (docs/DESIGN.md round-2 copy study).  This test
pins the contract that made the swap safe: identical pytree, identical
outputs and running-stat updates (bitwise), identical gradients, in both
train and eval modes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import pytest

from occdepth_tpu.models.layers import BatchNorm


class FlaxRef(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train):
        y = nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum,
            epsilon=self.epsilon, dtype=jnp.float32, param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(x.dtype)


def _seeded(tree):
    return jax.tree_util.tree_map(
        lambda a: a + jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) * 0.01,
        tree,
    )


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_bn_bitwise_vs_flax(dtype):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 7, 3), dtype) * 3 + 1
    ref, new = FlaxRef(), BatchNorm(momentum_torch=0.1)
    vr = _seeded(ref.init(jax.random.PRNGKey(1), x, True))
    vn = _seeded(new.init(jax.random.PRNGKey(1), x, True))
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vn)

    for train in (True, False):
        yr, mr = ref.apply(vr, x, train, mutable=["batch_stats"])
        yn, mn = new.apply(vn, x, train, mutable=["batch_stats"])
        np.testing.assert_array_equal(np.asarray(yr), np.asarray(yn))
        for a, b in zip(jax.tree_util.tree_leaves(mr),
                        jax.tree_util.tree_leaves(mn)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(v, mod):
        y, _ = mod.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gr = jax.grad(loss)(vr, ref)["params"]
    gn = jax.grad(loss)(vn, new)["params"]
    for a, b in zip(jax.tree_util.tree_leaves(gr),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
