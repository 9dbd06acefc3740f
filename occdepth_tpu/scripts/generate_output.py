"""Dump per-frame predictions for the visualizers.

Equivalent of occdepth/scripts/generate_output.py:86-134: manual inference
loop over the val split; softmax+argmax; pickle per-frame
{y_pred, target, fov_mask_1, cam_k, T_velo_2_cam / cam_pose, vox_origin}.
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_forward
from occdepth_tpu.training.trainer import Trainer, make_datasets, strip_metadata


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
    os.makedirs(args.output_dir, exist_ok=True)

    trainer = Trainer(cfg)
    _, val_ds = make_datasets(cfg)
    from occdepth_tpu.data.kitti import Loader

    loader = Loader(val_ds, cfg.batch_size_per_gpu, shuffle=False,
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

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    for path in dump_records(cfg, variables, loader, args.output_dir):
        print("wrote", path)


def full_scale_fov(cfg, cam_k, T_velo_2_cam, vox_origin=None):
    """Output-scale (1_1) FOV mask for one camera — what the reference's
    `fov_mask_1` is (kitti_dataset.py:258-284 at scale 1).  The model
    batch only carries the project-scale mask, which has 1/8 the voxels
    of y_pred and would not reshape onto it in the visualizers."""
    from occdepth_tpu.data.batch import vox_origin_for
    from occdepth_tpu.geometry.projection import vox2pix

    origin = vox_origin if vox_origin is not None else vox_origin_for(cfg)
    H, W = cfg.img_shape
    _, fov, _ = vox2pix(
        np.asarray(T_velo_2_cam, np.float64), np.asarray(cam_k, np.float64),
        np.asarray(origin, np.float64),
        cfg.voxel_size_meters * cfg.output_scale, W, H,
        cfg.scene_size_meters, 0,
    )
    return fov[:, 0]


def dump_records(cfg, variables, loader, output_dir):
    """Inference loop -> per-frame visualizer pickles (reference
    generate_output.py:86-134).  Yields each written path."""
    forward = make_forward(cfg)
    for batch in loader:
        frame_ids = batch["frame_id"]
        sequences = batch["sequence"]
        model_batch = strip_metadata(batch)
        out = forward(variables, model_batch)
        y_pred = np.asarray(jnp.argmax(out["ssc_logit"], axis=-1))
        for i, frame_id in enumerate(frame_ids):
            vox_origin = (
                np.asarray(batch["vox_origin"][i])
                if "vox_origin" in batch else None
            )
            record = {
                "y_pred": y_pred[i].astype(np.uint8),
                "fov_mask_1": full_scale_fov(
                    cfg, batch["cam_k"][i, 0], batch["T_velo_2_cam"][i, 0],
                    vox_origin,
                ),
                "cam_k": np.asarray(batch["cam_k"][i, 0]),
                "T_velo_2_cam": np.asarray(batch["T_velo_2_cam"][i, 0]),
            }
            if "target" in batch:
                record["target"] = np.asarray(batch["target"][i])
            if "vox_origin" in batch:
                record["vox_origin"] = np.asarray(batch["vox_origin"][i])
            if cfg.dataset == "NYU":
                # NYU visualizers consume the camera pose (world->cam inv)
                record["cam_pose"] = np.linalg.inv(
                    np.asarray(batch["T_velo_2_cam"][i, 0], np.float64)
                )
            out_path = os.path.join(
                output_dir, f"{sequences[i]}_{frame_id}.pkl"
            )
            with open(out_path, "wb") as f:
                pickle.dump(record, f)
            yield out_path


if __name__ == "__main__":
    main()
