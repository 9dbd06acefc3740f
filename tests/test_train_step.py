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
    logs, y_pred, completion, conf = eval_step(
        state.params, state.batch_stats, batch
    )
    assert y_pred.shape == batch["target"].shape
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
