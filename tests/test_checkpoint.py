"""Checkpoint save/restore roundtrip + best-metric tracking."""
import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.training.checkpoint import CheckpointManager
from occdepth_tpu.training.step import TrainState


def _tiny_state(value: float) -> TrainState:
    return TrainState(
        params={"w": jnp.full((3, 3), value)},
        batch_stats={"bn": {"mean": jnp.zeros(3)}},
        opt_state={"mu": jnp.ones(3) * value},
        step=jnp.asarray(int(value), jnp.int32),
    )


def test_roundtrip_and_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ckpts"))
    s1 = _tiny_state(1.0)
    mgr.save(s1, 1, {"val/mIoU": 0.10, "val/IoU": 0.2})
    s2 = _tiny_state(2.0)
    mgr.save(s2, 2, {"val/mIoU": 0.05, "val/IoU": 0.3})  # mIoU worse, IoU better

    target = _tiny_state(0.0)
    last = mgr.restore(target, "last")
    assert float(np.asarray(last.params["w"]).mean()) == 2.0

    best_miou = mgr.restore(target, "best_val_mIoU")
    assert float(np.asarray(best_miou.params["w"]).mean()) == 1.0
    best_iou = mgr.restore(target, "best_val_IoU")
    assert float(np.asarray(best_iou.params["w"]).mean()) == 2.0

    # a fresh manager in the same dir keeps the best table (auto-resume)
    mgr2 = CheckpointManager(str(tmp_path / "ckpts"))
    assert mgr2.best["val/mIoU"] == 0.10
    assert mgr2.has("last")
