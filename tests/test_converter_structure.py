"""The torch->flax converter must address exactly the flax parameter tree.

Builds the expected torch key list from the mapper itself (first pass with
an empty state dict), feeds placeholder tensors, and compares the produced
flax paths against the model's real init tree — catching any naming drift
between converter and modules across the whole model.
"""
import jax
import numpy as np
import pytest

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config, tiny_nyu_config
from occdepth_tpu.training import convert_torch as ct


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _run_converter(cfg, monkeypatch):
    # layout transforms are identity for this structural check
    for name in ("_conv2d", "_conv3d", "_convT3d", "_linear"):
        monkeypatch.setattr(ct, name, lambda w: w)
    # pass 1: collect expected torch keys
    m = ct._Mapper({})
    ct._map_unet2d(m, cfg)
    ct._map_unet3d(m, cfg)
    if cfg.trans_2d_to_3d == "flosp_depth":
        ct._map_flosp_depth(m, cfg)
    expected_keys = list(m.missing)
    # pass 2: placeholders
    sd = {k: np.zeros(1, np.float32) for k in expected_keys}
    params, stats, missing = ct.convert_state_dict(sd, cfg)
    assert not missing
    return _flatten(params), _flatten(stats)


@pytest.mark.parametrize("make_cfg", [tiny_kitti_config, tiny_nyu_config])
def test_converter_paths_match_model(make_cfg, monkeypatch):
    cfg = make_cfg()
    batch = make_synthetic_batch(cfg, batch_size=1)
    model = OccDepthModel(cfg=cfg)
    variables = jax.eval_shape(
        lambda rng, b: model.init(rng, b, train=False),
        jax.random.PRNGKey(0), batch,
    )
    model_params = _flatten(variables["params"])
    model_stats = _flatten(variables["batch_stats"])

    conv_params, conv_stats = _run_converter(cfg, monkeypatch)

    missing_in_conv = set(model_params) - set(conv_params)
    extra_in_conv = set(conv_params) - set(model_params)
    assert not missing_in_conv, sorted(missing_in_conv)[:10]
    assert not extra_in_conv, sorted(extra_in_conv)[:10]

    missing_stats = set(model_stats) - set(conv_stats)
    extra_stats = set(conv_stats) - set(model_stats)
    assert not missing_stats, sorted(missing_stats)[:10]
    assert not extra_stats, sorted(extra_stats)[:10]
