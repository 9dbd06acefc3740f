"""Uneven-final-batch eval: static-shape padding must not change metrics.

Reference behavior: Lightning evaluates the ragged remainder batch directly
(occdepth/scripts/eval.py:78-80; KITTI val = 795 frames, 795 % 8 = 3).  Our
validate() pads the final batch to the global batch with a `sample_valid`
mask; these tests pin that the result is *identical* to a per-sample loop.
"""
import dataclasses

import jax
import numpy as np
import pytest

import jax.numpy as jnp

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.data.kitti import Loader
from occdepth_tpu.losses.metrics import SSCMetrics, confusion_update
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_forward
from occdepth_tpu.training.trainer import Trainer
from tests.test_trainer_fit import FakeDataset


def test_confusion_update_sample_valid(rng):
    """Padded rows contribute nothing, not even to conf[0, 0]."""
    yp = rng.randint(0, 6, size=(4, 5, 5, 2))
    yt = rng.randint(0, 6, size=(4, 5, 5, 2))
    yt[0, 0, 0] = 255  # real invalid voxels still count as (0, 0)
    valid = jnp.asarray([True, True, False, False])

    comp_m, conf_m = confusion_update(
        jnp.asarray(yp), jnp.asarray(yt), 6, valid
    )
    comp_r, conf_r = confusion_update(
        jnp.asarray(yp[:2]), jnp.asarray(yt[:2]), 6
    )
    np.testing.assert_array_equal(np.asarray(comp_m), np.asarray(comp_r))
    np.testing.assert_array_equal(np.asarray(conf_m), np.asarray(conf_r))


@pytest.mark.slow
def test_validate_uneven_final_batch(tmp_path):
    """validate() over 11 samples on 8 devices == per-sample loop."""
    assert len(jax.devices()) == 8
    cfg = dataclasses.replace(
        tiny_kitti_config(), batch_size_per_gpu=1, logdir=str(tmp_path),
    )
    ds = FakeDataset(cfg, n=11, seed=2)
    trainer = Trainer(cfg, logdir=str(tmp_path))

    tx = make_optimizer(cfg, steps_per_epoch=1)
    batch0 = make_synthetic_batch(cfg, batch_size=1, seed=0)
    state = init_state(cfg, jax.random.PRNGKey(1), batch0, tx)

    loader = Loader(ds, trainer.global_batch, shuffle=False, drop_last=False,
                    num_workers=0)
    assert len(loader) == 2  # 8 + 3 (ragged)
    stats = trainer.validate(state, loader)

    # per-sample reference accumulation
    fwd = make_forward(cfg)
    metrics = SSCMetrics(cfg.n_classes)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for i in range(len(ds)):
        s = {
            k: np.asarray(v)[None]
            for k, v in ds[i].items()
            if k not in ("frame_id", "sequence")
        }
        out = fwd(variables, s)
        y_pred = np.argmax(np.asarray(out["ssc_logit"]), axis=-1)
        metrics.add_batch(y_pred, s["target"])
    ref = metrics.get_stats()

    assert stats["precision"] == pytest.approx(ref["precision"], abs=1e-12)
    assert stats["recall"] == pytest.approx(ref["recall"], abs=1e-12)
    assert stats["iou"] == pytest.approx(ref["iou"], abs=1e-12)
    np.testing.assert_allclose(stats["iou_ssc"], ref["iou_ssc"], atol=1e-12)
    assert "losses" in stats and np.isfinite(stats["losses"]["loss"])
