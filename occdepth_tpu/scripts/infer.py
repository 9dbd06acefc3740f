"""Single-frame / ad-hoc inference CLI — no dataset tree required.

The serving-style entrypoint: give it stereo (or mono) image files and a
KITTI-format calib.txt, and it runs the full pipeline (vox2pix geometry ->
normalized batch -> jitted forward) and writes the visualizer pickle
(same schema as generate_output) plus an optional rendered PNG.

    python -m occdepth_tpu.scripts.infer \
        --config occdepth_tpu/configs/semantic_kitti/..._cascadecls.yaml \
        --left 000000_2.png --right 000000_3.png --calib calib.txt \
        --ckpt last  [--torch-ckpt occdepth.ckpt]  --output out.pkl
        [--render out.png]

Multiple frames: pass --left/--right multiple times; frames are batched
(batch pipelining amortizes dispatch overhead, bench.py methodology).
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.data.augment import ida_matrix, normalize_rgb
from occdepth_tpu.data.batch import vox_origin_for
from occdepth_tpu.data.kitti_io import camera_geometry, read_calib
from occdepth_tpu.geometry.projection import vox2pix
from occdepth_tpu.scripts.generate_output import full_scale_fov
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_forward


def load_image(path: str, img_h: int, img_w: int) -> np.ndarray:
    from PIL import Image

    img = np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0
    return normalize_rgb(img[:img_h, :img_w])


def build_batch(cfg, lefts, rights, calib_path):
    calib = read_calib(calib_path)
    cam_k, T_velo_2_cam = camera_geometry(calib)
    n_views = 2 if cfg.multi_view_mode else 1
    img_h, img_w = cfg.img_shape
    vox_origin = vox_origin_for(cfg)

    pix, fov = [], []
    for v in range(n_views):
        p, f, _ = vox2pix(
            T_velo_2_cam[v], cam_k[v], vox_origin,
            cfg.voxel_size_meters * cfg.project_scale, img_w, img_h,
            cfg.scene_size_meters, cfg.pattern_id,
        )
        pix.append(p)
        fov.append(f)
    pix = np.stack(pix).astype(np.int32)
    fov = np.stack(fov)

    B = len(lefts)
    imgs = []
    for i in range(B):
        views = [load_image(lefts[i], img_h, img_w)]
        if n_views == 2:
            views.append(load_image(rights[i], img_h, img_w))
        imgs.append(np.stack(views))
    batch = {
        "img": np.stack(imgs),
        "projected_pix": np.broadcast_to(pix[None], (B,) + pix.shape).copy(),
        "fov_mask": np.broadcast_to(fov[None], (B,) + fov.shape).copy(),
        "cam_k": np.broadcast_to(
            cam_k[None, :n_views].astype(np.float32),
            (B, n_views, 3, 3)).copy(),
        "T_velo_2_cam": np.broadcast_to(
            T_velo_2_cam[None, :n_views].astype(np.float32),
            (B, n_views, 4, 4)).copy(),
        "ida_mats": np.broadcast_to(
            ida_matrix((0, 0, img_w, img_h), False)[None, None],
            (B, n_views, 4, 4)).astype(np.float32).copy(),
    }
    return batch, cam_k, T_velo_2_cam, fov


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--left", action="append", required=True)
    ap.add_argument("--right", action="append", default=[])
    ap.add_argument("--calib", required=True)
    ap.add_argument("--ckpt", default="last")
    ap.add_argument("--torch-ckpt", default=None)
    ap.add_argument("--output", required=True,
                    help="output pickle path (frame index appended if >1)")
    ap.add_argument("--render", default=None,
                    help="also render a PNG per frame to this path/prefix")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))

    batch, cam_k, T_velo_2_cam, fov = build_batch(
        cfg, args.left, args.right or args.left, args.calib
    )

    if args.torch_ckpt:
        from occdepth_tpu.training.convert_torch import load_torch_checkpoint

        variables, missing = load_torch_checkpoint(args.torch_ckpt, cfg)
        if missing:
            print(f"WARNING: {len(missing)} torch keys unmatched")
    else:
        from occdepth_tpu.training.trainer import Trainer

        tx = make_optimizer(cfg, 1)
        state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
        restored = Trainer(cfg).ckpt.restore(state, args.ckpt)
        if restored is not None:
            state = jax.tree_util.tree_map(jnp.asarray, restored)
        else:
            print("WARNING: no checkpoint found — random weights")
        variables = {"params": state.params, "batch_stats": state.batch_stats}

    forward = make_forward(cfg)
    out = forward(variables, batch)
    y_pred = np.asarray(jnp.argmax(out["ssc_logit"], axis=-1))

    B = y_pred.shape[0]
    for i in range(B):
        record = {
            "y_pred": y_pred[i].astype(np.uint8),
            "fov_mask_1": full_scale_fov(cfg, cam_k[0], T_velo_2_cam[0]),
            "cam_k": cam_k[0],
            "T_velo_2_cam": T_velo_2_cam[0],
        }
        path = args.output if B == 1 else (
            os.path.splitext(args.output)[0] + f"_{i}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(record, f)
        print("wrote", path)
        if args.render:
            from occdepth_tpu.scripts.visualization.voxel_vis import (
                render_frame,
            )

            png = args.render if B == 1 else (
                os.path.splitext(args.render)[0] + f"_{i}.png"
            )
            render_frame(record, png, dataset=cfg.dataset,
                         n_classes=cfg.n_classes)
            print("wrote", png)


if __name__ == "__main__":
    main()
