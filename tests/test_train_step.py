"""Train/eval step + multi-device data-parallel sharding tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.parallel import make_mesh, shard_batch
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import (
    init_state,
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=1, seed=3)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    return cfg, tx, batch, state


def test_eval_step(setup):
    cfg, tx, batch, state = setup
    eval_step = make_eval_step(cfg)
    logs, completion, conf = eval_step(
        state.params, state.batch_stats, batch
    )
    assert conf.shape == (cfg.n_classes, cfg.n_classes)
    assert np.isfinite(float(logs["loss"]))


def test_train_step_decreases_nothing_nan(setup):
    # NOTE: the train step donates its input state; runs after eval_step.
    cfg, tx, batch, state = setup
    params_before = jax.device_get(state.params)  # snapshot before donation
    train_step = make_train_step(cfg, tx)
    new_state, logs, completion, conf = train_step(
        state, batch, jnp.zeros(())
    )
    assert np.isfinite(float(logs["loss"]))
    for k, v in logs.items():
        assert np.isfinite(float(v)), k
    assert int(new_state.step) == 1
    # params actually changed
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(np.asarray(a) - np.asarray(b)).max()),
        params_before,
        jax.device_get(new_state.params),
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0
    assert conf.shape == (cfg.n_classes, cfg.n_classes)


@pytest.mark.dp
def test_data_parallel_8_devices():
    """Full train step sharded over an 8-device mesh (GSPMD DP)."""
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=8, seed=4)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)

    mesh = make_mesh(jax.devices(), ("data",))
    sharded = shard_batch(batch, mesh)
    train_step = make_train_step(cfg, tx)
    new_state, logs, completion, conf = train_step(
        state, sharded, jnp.zeros(())
    )
    assert np.isfinite(float(logs["loss"]))
    assert int(new_state.step) == 1


def test_dp_syncbn_and_grad_sync_exact():
    """GSPMD = DDP + SyncBatchNorm, verified exactly on a shallow model.

    Batch-axis reductions inside jit are *global* under a sharded batch:
    the BN batch statistics and the loss gradients from an 8-way-sharded
    step must equal the single-device ones (a per-shard-BN bug would
    inflate/deflate the variance by the between-shard component).  A
    shallow model keeps conv-algorithm fp noise below 1e-6 so this can
    assert tightly; test_dp_equivalence_full_model covers the real net.
    """
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
    rs = np.random.RandomState(0)
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

    mesh = make_mesh(jax.devices(), ("data",))
    xs, ys = (jax.device_put(a, shard_batch({"a": a}, mesh)["a"].sharding)
              for a in (x, y))
    g_sharded, bs_sharded = step(
        variables["params"], variables["batch_stats"], xs, ys
    )
    d0 = jax.devices()[0]
    g_single, bs_single = step(
        variables["params"], variables["batch_stats"],
        jax.device_put(x, d0), jax.device_put(y, d0),
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
        ),
        (g_sharded, bs_sharded), (g_single, bs_single),
    )


@pytest.mark.dp
@pytest.mark.slow
def test_dp_equivalence_full_model():
    """Sharded DP full train step ~= single-device step, same global batch.

    End-to-end wiring check at tolerances that allow for backend conv
    algorithm differences between the two executables (CPU oneDNN picks
    different blocking per batch shape; ~30 conv layers amplify ~1e-7
    per-op noise to ~1e-3 on the losses — measured, not semantic).  The
    exact-semantics assertion lives in test_dp_syncbn_and_grad_sync_exact.
    """
    assert len(jax.devices()) == 8
    cfg = tiny_kitti_config()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=8, seed=4)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    snapshot = jax.device_get(state)  # train_step donates its input
    train_step = make_train_step(cfg, tx)

    mesh = make_mesh(jax.devices(), ("data",))
    state_a, logs_a, comp_a, conf_a = train_step(
        state, shard_batch(batch, mesh), jnp.zeros(())
    )

    d0 = jax.devices()[0]
    put0 = lambda x: jax.device_put(x, d0)
    state_b = jax.tree_util.tree_map(put0, snapshot)
    state_b, logs_b, comp_b, conf_b = train_step(
        state_b, {k: put0(v) for k, v in batch.items()}, jnp.zeros(())
    )

    for k in logs_a:
        assert float(logs_a[k]) == pytest.approx(
            float(logs_b[k]), rel=1e-2, abs=1e-3
        ), k
    np.testing.assert_array_equal(np.asarray(comp_a), np.asarray(comp_b))
    # a handful of argmax tie-flips from fp noise are expected
    assert np.abs(np.asarray(conf_a) - np.asarray(conf_b)).sum() <= 64
    assert np.asarray(conf_a).sum() == np.asarray(conf_b).sum()

    # params moved by ~one Adam step (|update| <= ~lr); gross divergence
    # (e.g. unsynced grads) would show up as multiples of that
    flat_b = dict(jax.tree_util.tree_leaves_with_path(
        jax.device_get(state_b.params)
    ))
    for path, leaf_a in jax.tree_util.tree_leaves_with_path(
        jax.device_get(state_a.params)
    ):
        np.testing.assert_allclose(
            leaf_a, flat_b[path], atol=3 * cfg.lr, rtol=1e-2,
            err_msg=jax.tree_util.keystr(path),
        )


def test_remat_heads_grads_exact():
    """cfg.remat_heads is pure rematerialization: identical forward,
    losses, and gradients (jax.checkpoint recomputes, never changes
    math), identical parameter pytree."""
    from occdepth_tpu.training.step import compute_losses, create_model

    cfg_a = tiny_kitti_config()
    cfg_b = tiny_kitti_config(remat_heads=True)
    batch = make_synthetic_batch(cfg_a, batch_size=1, seed=7)
    model_a, model_b = create_model(cfg_a), create_model(cfg_b)
    var_a = model_a.init(jax.random.PRNGKey(1), batch, train=False)
    var_b = model_b.init(jax.random.PRNGKey(1), batch, train=False)
    assert (jax.tree_util.tree_structure(var_a)
            == jax.tree_util.tree_structure(var_b))

    def loss_of(model):
        def f(params, batch_stats):
            out, _ = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch, train=True, mutable=["batch_stats"],
            )
            loss, _ = compute_losses(cfg_a, out, batch, jnp.zeros(()))
            return loss
        return f

    la, ga = jax.jit(jax.value_and_grad(loss_of(model_a)))(
        var_a["params"], var_a["batch_stats"])
    lb, gb = jax.jit(jax.value_and_grad(loss_of(model_b)))(
        var_b["params"], var_b["batch_stats"])
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_remat_loss_grads_exact():
    """cfg.remat_loss is pure rematerialization of the loss assembly:
    identical losses and gradients (jax.checkpoint re-runs the same
    math in the backward), no pytree change."""
    import dataclasses

    cfg_a = tiny_kitti_config()
    cfg_b = dataclasses.replace(cfg_a, remat_loss=True)
    batch = make_synthetic_batch(cfg_a, batch_size=1, seed=11)

    outs = []
    for cfg in (cfg_a, cfg_b):
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = init_state(cfg, jax.random.PRNGKey(2), batch, tx)
        step = make_train_step(cfg, tx)
        state, logs, *_ = step(state, batch, jnp.zeros(()))
        outs.append((jax.device_get(state.params), float(logs["loss"])))

    (pa, la), (pb, lb) = outs
    np.testing.assert_allclose(la, lb, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
