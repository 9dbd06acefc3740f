"""Headless voxel visualisation (matplotlib; no mayavi/open3d dependency).

Plays the role of the reference's mayavi renderers
(occdepth/scripts/visualization/kitti_vis_pred.py, NYU_vis_pred.py,
TartanAir_visualization.py): reads the per-frame pickles written by
`generate_output` and renders the semantic voxel grid to PNG — a 3D
scatter view plus a top-down (BEV) class map.
"""
from __future__ import annotations

import argparse
import glob
import os
import pickle

import numpy as np

from occdepth_tpu.data.kitti_io import COLOR_MAP_BGR


def class_colors(n_classes: int) -> np.ndarray:
    cols = np.zeros((n_classes, 3), np.float32)
    for c in range(n_classes):
        bgr = COLOR_MAP_BGR.get(c, (128, 128, 128))
        cols[c] = np.array(bgr[::-1], np.float32) / 255.0
    return cols


def render_frame(record: dict, out_path: str, voxel_stride: int = 2,
                 n_classes: int = 20):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    y_pred = np.asarray(record["y_pred"])
    cols = class_colors(n_classes)

    fig = plt.figure(figsize=(16, 7))

    # 3D scatter of occupied voxels (subsampled for speed)
    ax = fig.add_subplot(1, 2, 1, projection="3d")
    g = y_pred[::voxel_stride, ::voxel_stride, ::voxel_stride]
    occ = np.argwhere((g > 0) & (g != 255))
    if occ.size:
        labs = g[occ[:, 0], occ[:, 1], occ[:, 2]]
        ax.scatter(occ[:, 0], occ[:, 1], occ[:, 2], c=cols[labs % n_classes],
                   s=2, marker="s", linewidths=0)
    ax.set_title("predicted occupancy")
    ax.set_box_aspect([g.shape[0], g.shape[1], max(1, g.shape[2])])

    # top-down (highest occupied voxel wins)
    ax2 = fig.add_subplot(1, 2, 2)
    occ3d = (y_pred > 0) & (y_pred != 255)
    top = np.zeros(y_pred.shape[:2], np.int32)
    zmax = y_pred.shape[2]
    for z in range(zmax):  # low to high; higher overwrites
        m = occ3d[:, :, z]
        top[m] = y_pred[:, :, z][m]
    img = cols[top % n_classes]
    img[top == 0] = 1.0
    ax2.imshow(np.rot90(img), interpolation="nearest")
    ax2.set_title("top-down semantic map")
    ax2.axis("off")

    fig.tight_layout()
    fig.savefig(out_path, dpi=110)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-dir", required=True,
                    help="directory of generate_output pickles")
    ap.add_argument("--output-dir", required=True)
    ap.add_argument("--n-classes", type=int, default=20)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    paths = sorted(glob.glob(os.path.join(args.input_dir, "*.pkl")))
    if args.limit:
        paths = paths[: args.limit]
    for p in paths:
        with open(p, "rb") as f:
            record = pickle.load(f)
        out = os.path.join(
            args.output_dir,
            os.path.splitext(os.path.basename(p))[0] + ".png",
        )
        render_frame(record, out, n_classes=args.n_classes)
        print("wrote", out)


if __name__ == "__main__":
    main()
