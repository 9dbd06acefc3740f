"""Gradient accumulation + multi-slice ("dcn","data") hybrid-mesh tests.

The reference exposes gradient accumulation through Lightning's Trainer
(accumulate_grad_batches) and scales only single-tier NCCL DDP; the TPU
equivalents are a scanned-microbatch train step and a 2-D hybrid mesh
whose outer axis models the DCN hop between slices (parallel/mesh.py).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.parallel import make_hybrid_mesh, make_mesh, shard_batch
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_train_step


def test_grad_accum_matches_single_step():
    """K=2 accumulation over two identical microbatches == one plain step.

    Identical microbatches make the mean gradient equal the single-step
    gradient, so under plain SGD the param delta must match (linear in the
    gradient — a sum-instead-of-mean accumulation bug shows up as a 2x
    delta; Adam would mask it behind its scale normalization and amplify
    per-compile fp reassociation noise on near-zero grads).  Confusion
    counts must double; BN running stats advance twice (per-microbatch,
    Lightning semantics) so they are excluded.
    """
    import optax

    cfg = tiny_kitti_config()
    tx = optax.sgd(0.1)
    batch = make_synthetic_batch(cfg, batch_size=1, seed=11)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    snapshot = jax.device_get(state)  # train_step donates its input

    step1 = make_train_step(cfg, tx)
    s_a, logs_a, comp_a, conf_a = step1(state, batch, jnp.zeros(()))

    stacked = {k: np.stack([v, v]) for k, v in batch.items()}
    state_b = jax.tree_util.tree_map(jnp.asarray, snapshot)
    step2 = make_train_step(cfg, tx, accum_steps=2)
    s_b, logs_b, comp_b, conf_b = step2(state_b, stacked, jnp.zeros(()))

    # compare the SGD deltas (= -lr * grad mean), scaled per-leaf
    for (path, a), (_, b), (_, p0) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_a.params)),
        jax.tree_util.tree_leaves_with_path(jax.device_get(s_b.params)),
        jax.tree_util.tree_leaves_with_path(snapshot.params),
    ):
        da = np.asarray(a - p0).ravel().astype(np.float64)
        db = np.asarray(b - p0).ravel().astype(np.float64)
        na, nb = np.linalg.norm(da), np.linalg.norm(db)
        if max(na, nb) < 1e-5:
            # mathematically-zero gradient (e.g. a bias feeding a
            # softmax); the delta is pure fp noise — nothing to compare
            continue
        # norm-ratio + direction check: robust to the ~1% per-element
        # conv-algorithm noise between the two executables (same effect
        # test_dp_equivalence_full_model documents), while a
        # sum-instead-of-mean bug is a 2x norm, a dropped microbatch a
        # direction/norm change
        key = jax.tree_util.keystr(path)
        assert 0.9 < nb / na < 1.1, (key, na, nb)
        cos = float(da @ db / (na * nb))
        assert cos > 0.99, (key, cos)
    for k in logs_a:
        assert float(logs_a[k]) == pytest.approx(
            float(logs_b[k]), rel=1e-4, abs=1e-6
        ), k
    np.testing.assert_array_equal(2 * np.asarray(comp_a), np.asarray(comp_b))
    np.testing.assert_array_equal(2 * np.asarray(conf_a), np.asarray(conf_b))
    assert int(s_b.step) == 1  # one optimizer step, not K


def test_hybrid_mesh_grads_match_single_device():
    """(2, 4) dcn x data mesh: global-batch reductions (grads + BN batch
    stats) equal the single-device result — the hierarchical all-reduce
    changes the wire pattern, not the math."""
    import flax.linen as fnn

    assert len(jax.devices()) == 8

    class Toy(fnn.Module):
        @fnn.compact
        def __call__(self, x, train):
            h = fnn.Dense(16)(x)
            h = fnn.BatchNorm(use_running_average=not train)(h)
            h = fnn.relu(h)
            return fnn.Dense(1)(h)

    model = Toy()
    rs = np.random.RandomState(1)
    x = rs.randn(64, 8).astype(np.float32)
    y = rs.randn(64, 1).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)

    def loss_fn(params, stats, xb, yb):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, xb, train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean((out - yb) ** 2), mut["batch_stats"]

    step = jax.jit(jax.grad(loss_fn, has_aux=True))

    mesh = make_hybrid_mesh(n_slices=2)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("dcn", "data")
    data = shard_batch({"x": x, "y": y}, mesh)
    g_mesh, bs_mesh = step(
        variables["params"], variables["batch_stats"], data["x"], data["y"]
    )
    d0 = jax.devices()[0]
    g_one, bs_one = step(
        variables["params"], variables["batch_stats"],
        jax.device_put(x, d0), jax.device_put(y, d0),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        ),
        (g_mesh, bs_mesh), (g_one, bs_one),
    )


def test_hybrid_mesh_bad_slice_count():
    with pytest.raises(ValueError):
        make_hybrid_mesh(n_slices=3)


@pytest.mark.slow
def test_full_step_accum_on_hybrid_mesh():
    """Flagship-structure train step: K=2 microbatches of global batch 8,
    sharded over the (2, 4) hybrid mesh — compiles, runs, stays finite."""
    assert len(jax.devices()) == 8
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=8, seed=12)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)

    mesh = make_hybrid_mesh(n_slices=2)
    stacked = {k: np.stack([v, v]) for k, v in batch.items()}
    sharded = shard_batch(stacked, mesh, batch_dim=1)
    step = make_train_step(cfg, tx, accum_steps=2)
    new_state, logs, completion, conf = step(state, sharded, jnp.zeros(()))
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1
    assert int(np.asarray(conf).sum()) > 0


def test_shard_batch_uneven_batch_rejected():
    """Global batch not divisible by the mesh's device count is a clear
    error, not a cryptic GSPMD failure (VERDICT r2 #4)."""
    mesh = make_hybrid_mesh(n_slices=2)
    bad = {"img": np.zeros((6, 4, 4, 3), np.float32)}
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(bad, mesh)
    # accum layout: (K, B, ...) checks dim 1
    bad2 = {"img": np.zeros((2, 6, 4, 3), np.float32)}
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(bad2, mesh, batch_dim=1)
    # divisible passes
    shard_batch({"img": np.zeros((16, 2, 2, 3), np.float32)}, mesh)


@pytest.mark.slow
def test_full_model_hybrid_vs_flat_equivalence():
    """FULL tiny-flagship train step: the (2,4) ("dcn","data") hybrid mesh
    must produce the same step as the flat (8,) ("data",) mesh — the
    hierarchical (ICI-then-DCN) all-reduce changes the wire pattern, not
    the math (VERDICT r2 #4: the prior numeric hybrid test used a toy
    Dense net; this one runs the real step structure).

    Tolerances allow for backend conv-algorithm differences between the
    two executables (see test_dp_equivalence_full_model).
    """
    assert len(jax.devices()) == 8
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=8, seed=4)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    snapshot = jax.device_get(state)  # train_step donates its input
    train_step = make_train_step(cfg, tx)

    flat = make_mesh(jax.devices(), ("data",))
    s_a, logs_a, comp_a, conf_a = train_step(
        state, shard_batch(batch, flat), jnp.zeros(())
    )

    hybrid = make_hybrid_mesh(n_slices=2)
    state_b = jax.tree_util.tree_map(jnp.asarray, snapshot)
    s_b, logs_b, comp_b, conf_b = train_step(
        state_b, shard_batch(batch, hybrid), jnp.zeros(())
    )

    for k in logs_a:
        assert float(logs_a[k]) == pytest.approx(
            float(logs_b[k]), rel=1e-2, abs=1e-3
        ), k
    np.testing.assert_array_equal(np.asarray(comp_a), np.asarray(comp_b))
    assert np.abs(np.asarray(conf_a) - np.asarray(conf_b)).sum() <= 64
    assert np.asarray(conf_a).sum() == np.asarray(conf_b).sum()
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(s_b.params)
    ))
    for path, leaf_a in jax.tree_util.tree_leaves_with_path(
        jax.device_get(s_a.params)
    ):
        np.testing.assert_allclose(
            leaf_a, flat_b[path], atol=3 * cfg.lr, rtol=1e-2,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.slow
def test_global_batch_exceeds_device_count():
    """Global batch 16 on the 8-device flat mesh: 2 samples/device, one
    executable, finite loss — DP beyond one-sample-per-chip (VERDICT r2
    #4 'global batch > device count')."""
    assert len(jax.devices()) == 8
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=16, seed=13)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    mesh = make_mesh(jax.devices(), ("data",))
    step = make_train_step(cfg, tx)
    new_state, logs, completion, conf = step(
        state, shard_batch(batch, mesh), jnp.zeros(())
    )
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1
    assert int(np.asarray(conf).sum()) > 0


@pytest.mark.slow
def test_16_device_mesh_topologies():
    """(4,4), (2,8) hybrid and (16,) flat meshes on 16 virtual devices, in
    a subprocess (the suite pins 8): toy model + BN, global batch 64 (4
    samples/device), numeric equivalence across all three topologies and
    a single device; n_slices=5 rejected (VERDICT r2 #4)."""
    import subprocess
    import sys

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=16"
    env["JAX_PLATFORMS"] = "cpu"
    script = os.path.join(os.path.dirname(__file__), "sixteen_dev_check.py")
    res = subprocess.run(
        [sys.executable, script], env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "16dev OK" in res.stdout, res.stdout
