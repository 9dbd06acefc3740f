"""Export the model as a serialized StableHLO program.

The TPU-native counterpart of the reference's ONNX export
(models/OccDepth.py:684-692 and the f2v custom GridSample symbolic,
f2v/sampler.py:9-34): `jax.export` serializes the jitted forward with its
exact compiled semantics — no custom-op registry needed, and the artifact
replays on any XLA backend via jax.export.deserialize.

    python -m occdepth_tpu.scripts.export_model --config <yaml> --out model.stablehlo
"""
from __future__ import annotations

import argparse

import jax
import numpy as np

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel


def export_forward(cfg, variables, batch):
    model = OccDepthModel(cfg=cfg)

    def fn(variables, batch):
        return model.apply(variables, batch, train=False)["ssc_logit"]

    exported = jax.export.export(jax.jit(fn))(variables, batch)
    return exported


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))

    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=False)
    model = OccDepthModel(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    exported = export_forward(cfg, variables, batch)
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
