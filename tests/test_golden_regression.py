"""Golden-value regression: tiny-model logits pinned against a fixture.

Catches unintended numeric drift from future refactors (the exact-math
rewrites like conv3d decomposition must keep these bit-stable within fp32
tolerance).  Regenerate deliberately with:
    python -m tests.test_golden_regression
"""
import os

import jax
import numpy as np

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_kitti.npz")


def _compute():
    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=123)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(7), batch, train=False)
    out = model.apply(variables, batch, train=False)
    logits = np.asarray(out["ssc_logit"], np.float32)
    # a stable digest: mean/std + a fixed probe of 64 values
    flat = logits.reshape(-1)
    probe_idx = np.linspace(0, flat.size - 1, 64).astype(np.int64)
    return {
        "mean": np.float32(flat.mean()),
        "std": np.float32(flat.std()),
        "probe": flat[probe_idx],
    }


def test_tiny_kitti_logits_match_golden():
    assert os.path.exists(GOLDEN), (
        "golden fixture missing — run `python -m tests.test_golden_regression`"
    )
    got = _compute()
    ref = np.load(GOLDEN)
    np.testing.assert_allclose(got["mean"], ref["mean"], atol=2e-4)
    np.testing.assert_allclose(got["std"], ref["std"], atol=2e-4)
    np.testing.assert_allclose(got["probe"], ref["probe"], atol=5e-3)


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_compute())
    print("wrote", GOLDEN)
