"""StableHLO export roundtrip on the tiny model."""
import jax
import numpy as np

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.scripts.export_model import export_forward
from occdepth_tpu.testing import tiny_nyu_config


def test_export_roundtrip():
    cfg = tiny_nyu_config()
    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=False)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    exported = export_forward(cfg, variables, batch)
    blob = exported.serialize()
    assert len(blob) > 1000

    reloaded = jax.export.deserialize(blob)
    out = reloaded.call(variables, batch)
    ref = model.apply(variables, batch, train=False)["ssc_logit"]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
