"""Per-sample eval unroll (models.occdepth.eval_apply) == batched apply.

The unroll exists to dodge XLA's batch>=2 layout regressions at eval time
(docs/DESIGN.md); it must be a pure performance transform — identical
outputs, shared parameters.
"""
import jax
import numpy as np

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.models.occdepth import eval_apply
from occdepth_tpu.testing import tiny_kitti_config


def test_eval_apply_unrolled_matches_batched():
    cfg = tiny_kitti_config()
    model = OccDepthModel(cfg=cfg)
    batch = make_synthetic_batch(cfg, batch_size=3, seed=7, with_labels=False)
    # distinct images per sample (broadcast batches would hide indexing bugs)
    rs = np.random.RandomState(11)
    batch["img"] = rs.randn(*batch["img"].shape).astype(np.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )

    batched = jax.jit(
        lambda v, b: eval_apply(model, v, b, unroll=False)
    )(variables, batch)
    unrolled = jax.jit(
        lambda v, b: eval_apply(model, v, b, unroll=True)
    )(variables, batch)

    assert set(batched) == set(unrolled)
    for k in batched:
        np.testing.assert_allclose(
            np.asarray(batched[k]), np.asarray(unrolled[k]),
            rtol=0, atol=1e-5, err_msg=k,
        )


def test_eval_unroll_config_gate():
    """cfg.eval_unroll=False forces the single batched code path (for
    layout experiments / future compilers); True keeps the per-sample
    unroll default on one device (docs/DESIGN.md finding #7)."""
    import dataclasses
    from unittest import mock

    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=3, seed=1, with_labels=False)

    class FakeModel:
        def __init__(self, c):
            self.cfg = c
            self.calls = 0

        def apply(self, variables, b, train):
            self.calls += 1
            return {"ssc_logit": b["img"][:, :1, :1, :1, :1]}

    with mock.patch.object(jax, "device_count", lambda backend=None: 1):
        m_on = FakeModel(dataclasses.replace(cfg, eval_unroll=True))
        eval_apply(m_on, {}, batch)
        assert m_on.calls == 3  # unrolled per sample

        m_off = FakeModel(dataclasses.replace(cfg, eval_unroll=False))
        eval_apply(m_off, {}, batch)
        assert m_off.calls == 1  # one batched apply
