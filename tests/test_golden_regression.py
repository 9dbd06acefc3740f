"""Golden-value regression: tiny-model outputs pinned against a fixture.

Catches unintended numeric drift from future refactors (the exact-math
rewrites like conv3d decomposition must keep these bit-stable within fp32
tolerance).  Every output head (ssc_logit, occ_logit, P_logits,
depth_pred, ...) is digested separately — per-head dense probes plus
per-channel means — so a localized regression (e.g. one head or one
channel) cannot hide inside a whole-tensor mean.  Regenerate deliberately:
    python -m tests.test_golden_regression
"""
import os

import jax
import numpy as np

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_kitti.npz")
N_PROBE = 512


def _digest(name, arr, out):
    flat = np.asarray(arr, np.float32).reshape(-1)
    probe_idx = np.linspace(0, flat.size - 1, min(N_PROBE, flat.size))
    out[f"{name}.mean"] = np.float32(flat.mean())
    out[f"{name}.std"] = np.float32(flat.std())
    out[f"{name}.probe"] = flat[probe_idx.astype(np.int64)]
    # per-channel means over the trailing axis (catches one-channel drift)
    a = np.asarray(arr, np.float32)
    out[f"{name}.chan_mean"] = a.reshape(-1, a.shape[-1]).mean(0)


def _compute():
    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=123)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(7), batch, train=False)
    out = model.apply(variables, batch, train=False)
    digests = {}
    for k in sorted(out):
        v = out[k]
        if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype, np.floating):
            _digest(k, v, digests)
    return digests


def test_tiny_kitti_outputs_match_golden():
    assert os.path.exists(GOLDEN), (
        "golden fixture missing — run `python -m tests.test_golden_regression`"
    )
    got = _compute()
    ref = np.load(GOLDEN)
    assert set(got) == set(ref.files), (
        f"output-head set changed: {sorted(set(got) ^ set(ref.files))} — "
        "regenerate the fixture if intentional"
    )
    for k in sorted(got):
        atol = 2e-4 if k.endswith((".mean", ".std", ".chan_mean")) else 5e-3
        np.testing.assert_allclose(
            got[k], ref[k], atol=atol, err_msg=f"golden mismatch at {k}"
        )


if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez(GOLDEN, **_compute())
    print("wrote", GOLDEN, "with keys:", end=" ")
    print(", ".join(np.load(GOLDEN).files))
