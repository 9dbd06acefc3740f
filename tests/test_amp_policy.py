"""AMP / mixed-precision policy tests.

The reference trains under torch native autocast with one explicit fp32
island for the depth BCE (loss/depth_loss.py:80-85).  The TPU policy
(docs/DESIGN.md "Numerics policy"): params fp32, conv/matmul compute
bf16 via cfg.compute_dtype, BatchNorm statistics / softmax / every loss
fp32.  These tests pin that policy so a dtype regression (a silently
bf16 loss or BN stat) cannot land.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.losses.depth import depth_cls_loss
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import (
    init_state,
    make_train_step,
)


def test_bf16_train_step_keeps_master_state_fp32():
    cfg = tiny_kitti_config(compute_dtype="bfloat16")
    tx = make_optimizer(cfg, steps_per_epoch=10)
    batch = make_synthetic_batch(cfg, batch_size=1, seed=21)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)

    for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
        assert leaf.dtype == jnp.float32, jax.tree_util.keystr(path)
    for path, leaf in jax.tree_util.tree_leaves_with_path(state.batch_stats):
        assert leaf.dtype == jnp.float32, jax.tree_util.keystr(path)

    step = make_train_step(cfg, tx)
    new_state, logs, completion, conf = step(state, batch, jnp.zeros(()))

    # every loss term is an fp32 scalar and finite under bf16 compute
    for k, v in logs.items():
        assert v.dtype == jnp.float32, k
        assert np.isfinite(float(v)), k
    # master params and BN running stats stay fp32 after the update
    for path, leaf in jax.tree_util.tree_leaves_with_path(new_state.params):
        assert leaf.dtype == jnp.float32, jax.tree_util.keystr(path)
    for path, leaf in jax.tree_util.tree_leaves_with_path(
        new_state.batch_stats
    ):
        assert leaf.dtype == jnp.float32, jax.tree_util.keystr(path)


def test_bf16_forward_computes_in_bf16():
    """The 2D backbone features really are bf16 under the policy (the
    point of compute_dtype; if a stray upcast made everything fp32 the
    MXU/bandwidth win would silently vanish)."""
    from occdepth_tpu.models import OccDepthModel

    cfg = tiny_kitti_config(compute_dtype="bfloat16")
    model = OccDepthModel(cfg=cfg)
    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=False, seed=3)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    out, inter = model.apply(
        variables, batch, train=False,
        capture_intermediates=lambda mdl, name: mdl.name == "net_rgb",
        mutable=["intermediates"],
    )
    feats = inter["intermediates"]["net_rgb"]["__call__"][0]
    assert any(
        v.dtype == jnp.bfloat16
        for v in jax.tree_util.tree_leaves(feats)
    )
    # and with float32 compute nothing is bf16
    cfg32 = tiny_kitti_config(compute_dtype="float32")
    model32 = OccDepthModel(cfg=cfg32)
    out32, inter32 = model32.apply(
        variables, batch, train=False,
        capture_intermediates=lambda mdl, name: mdl.name == "net_rgb",
        mutable=["intermediates"],
    )
    feats32 = inter32["intermediates"]["net_rgb"]["__call__"][0]
    assert all(
        v.dtype == jnp.float32
        for v in jax.tree_util.tree_leaves(feats32)
    )


def test_depth_bce_fp32_island():
    """depth_cls_loss returns fp32 and matches the fp32 result when fed
    bf16 predictions (the reference's autocast(enabled=False) island,
    loss/depth_loss.py:80-85)."""
    rs = np.random.RandomState(0)
    B, V, h, w, D = 1, 2, 4, 6, 16
    d_bound = (2.0, 10.0, 0.5)
    pred = jax.nn.softmax(
        jnp.asarray(rs.randn(B, V, h, w, D), jnp.float32), axis=-1
    )
    gt = jnp.asarray(
        rs.uniform(0.0, 12.0, size=(B, V, h * 4, w * 4)), jnp.float32
    )
    l32 = depth_cls_loss(gt, pred, 4, d_bound)
    lbf = depth_cls_loss(gt, pred.astype(jnp.bfloat16), 4, d_bound)
    assert l32.dtype == jnp.float32
    assert lbf.dtype == jnp.float32
    assert float(lbf) == pytest.approx(float(l32), rel=5e-3)
