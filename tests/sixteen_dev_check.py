"""16-virtual-device mesh topology check, run as a subprocess by
tests/test_parallel_scaling.py::test_16_device_mesh_topologies (the suite
itself pins 8 devices via conftest).

Covers (VERDICT r2 #4): (4,4) and (2,8) ("dcn","data") hybrid meshes, the
flat (16,) mesh, global batch 64 (> device count: 4 samples/device),
numeric gradient/BN-stat equivalence of every topology against a single
device, and uneven n_slices rejection.  A toy conv+BN net keeps the four
compiles in seconds; the FULL-model hybrid numerics run at 8 devices in
the main suite (test_full_model_hybrid_vs_flat_equivalence).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import flax.linen as fnn
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.parallel import make_hybrid_mesh, make_mesh, shard_batch


class Toy(fnn.Module):
    @fnn.compact
    def __call__(self, x, train):
        h = fnn.Conv(8, (3, 3))(x)
        h = fnn.BatchNorm(use_running_average=not train)(h)
        h = fnn.relu(h)
        h = h.mean(axis=(1, 2))
        return fnn.Dense(1)(h)


def main():
    assert len(jax.devices()) == 16, jax.devices()

    model = Toy()
    rs = np.random.RandomState(3)
    x = rs.randn(64, 8, 8, 3).astype(np.float32)  # global batch 64 > 16
    y = rs.randn(64, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params, stats, xb, yb):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, xb, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((out - yb) ** 2), mut["batch_stats"]

    step = jax.jit(jax.grad(loss_fn, has_aux=True))

    d0 = jax.devices()[0]
    g_ref, bs_ref = step(
        variables["params"], variables["batch_stats"],
        jax.device_put(x, d0), jax.device_put(y, d0),
    )

    meshes = {
        "(16,) flat": make_mesh(jax.devices(), ("data",)),
        "(4,4) hybrid": make_hybrid_mesh(4),
        "(2,8) hybrid": make_hybrid_mesh(2),
    }
    for name, mesh in meshes.items():
        data = shard_batch({"x": x, "y": y}, mesh)
        g, bs = step(
            variables["params"], variables["batch_stats"],
            data["x"], data["y"],
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5
            ),
            (g, bs), (g_ref, bs_ref),
        )
        print(f"{name}: grads+BN stats == single-device", flush=True)

    try:
        make_hybrid_mesh(5)
    except ValueError:
        print("n_slices=5 over 16 devices rejected", flush=True)
    else:
        raise AssertionError("expected ValueError for n_slices=5")

    try:
        shard_batch({"x": x[:60]}, meshes["(16,) flat"])
    except ValueError:
        print("uneven batch 60/16 rejected", flush=True)
    else:
        raise AssertionError("expected ValueError for uneven batch")

    print("16dev OK", flush=True)


if __name__ == "__main__":
    main()
