"""Write a SemanticKITTI SSC benchmark submission.

Equivalent of occdepth/scripts/generate_kitti_submission.py:62-85:
test-split inference, map train ids back to raw label ids via the inverse
learning map, write uint16 `.label` files in the CodaLab layout
(<out>/sequences/<seq>/predictions/<frame>.label).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.data.kitti import KittiDataset, Loader
from occdepth_tpu.data.kitti_io import get_inv_map
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_forward
from occdepth_tpu.training.trainer import Trainer, strip_metadata


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default="last")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference PyTorch .ckpt to convert and run")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))

    trainer = Trainer(cfg)
    test_ds = KittiDataset(cfg, "test")
    loader = Loader(test_ds, cfg.batch_size_per_gpu, shuffle=False,
                    drop_last=False)
    tx = make_optimizer(cfg, 1)
    example = strip_metadata(next(iter(loader)))
    state = init_state(cfg, jax.random.PRNGKey(0), example, tx)
    if args.torch_ckpt:
        from occdepth_tpu.training.convert_torch import load_torch_into_state

        state = load_torch_into_state(state, args.torch_ckpt, cfg)
    else:
        restored = trainer.ckpt.restore(state, args.ckpt)
        if restored is not None:
            state = jax.tree_util.tree_map(jnp.asarray, restored)
    forward = make_forward(cfg)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    inv_map = get_inv_map()
    for batch in loader:
        frame_ids = batch["frame_id"]
        sequences = batch["sequence"]
        out = forward(variables, strip_metadata(batch))
        y_pred = np.asarray(jnp.argmax(out["ssc_logit"], axis=-1))
        for i, frame_id in enumerate(frame_ids):
            path = write_prediction(
                args.output_dir, sequences[i], frame_id, y_pred[i], inv_map
            )
            print("wrote", path)


def write_prediction(output_dir: str, sequence: str, frame_id: str,
                     y_pred: np.ndarray, inv_map: np.ndarray) -> str:
    """Map train ids back to raw label ids and write one CodaLab-layout
    uint16 `.label` file (reference generate_kitti_submission.py:62-85)."""
    pred = inv_map[np.asarray(y_pred).reshape(-1)].astype(np.uint16)
    out_dir = os.path.join(output_dir, "sequences", sequence, "predictions")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, frame_id + ".label")
    pred.tofile(path)
    return path


if __name__ == "__main__":
    main()
