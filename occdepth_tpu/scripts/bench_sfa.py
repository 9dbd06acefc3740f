"""Ablate the SFA lift to locate its device time.

The amortized component bench puts sfa_lift at ~22 ms while the raw row
gathers microbench at ~1 ms total — this script times the lift's pieces
(per scale, gather-only, fusion-only) with the same K-repeat in-jit
methodology to find the real cost.

    python -m occdepth_tpu.scripts.bench_sfa
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.models.sfa import sfa_lift
from occdepth_tpu.ops.flosp_gather import flosp_gather_flat, multiview_cosine_fuse
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    K = args.repeats
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    cfg = OccDepthConfig(dataset="kitti", use_stereo_depth_gt=False)
    H, W = cfg.img_shape
    N = int(np.prod(cfg.scene_dims(cfg.project_scale)))
    rs = np.random.RandomState(0)

    feats = {}
    for s in (1, 2, 4, 8):
        h, w = -(-H // s), -(-W // s)
        feats[f"1_{s}"] = jnp.asarray(
            rs.randn(1, 2, h, w, 32).astype(np.float32), dtype)
    # realistic spatially-coherent projections: smooth per-voxel pixels
    pix = np.stack([
        rs.randint(0, W, size=(1, 2, N, 1)),
        rs.randint(0, H, size=(1, 2, N, 1)),
    ], axis=-1).astype(np.int32)
    pix = jnp.asarray(pix)
    fov = jnp.asarray(rs.rand(1, 2, N, 1) < 0.45)

    t = timeit(lambda f: sfa_lift(
        f, pix, fov, cfg.project_res, cfg.scene_dims(cfg.project_scale),
        "kitti"), feats, K=K)
    print(f"sfa_lift (4 scales, 2 views, fuse): {t:7.2f} ms")

    # per-scale: gather+fuse for a single scale
    for s in (1, 2, 4, 8):
        f1 = {f"1_{s}": feats[f"1_{s}"]}
        t = timeit(lambda f, s=s: sfa_lift(
            f, pix, fov, (s,), cfg.scene_dims(cfg.project_scale),
            "kitti"), f1, K=K)
        print(f"  scale 1_{s} only (gather+fuse):    {t:7.2f} ms")

    # gathers only, all scales (sum views, no cosine fusion)
    def gathers_only(f):
        out = None
        for s in (1, 2, 4, 8):
            p = pix // s if s > 1 else pix
            fe, va = flosp_gather_flat(f[f"1_{s}"], p, fov)
            v = (fe * va[..., None]).sum(axis=1)[0]
            out = v if out is None else out + v
        return out

    t = timeit(gathers_only, feats, K=K)
    print(f"gathers only (4 scales, 2 views):   {t:7.2f} ms")

    # fusion only: pre-gathered feats
    gf = jnp.asarray(rs.randn(2, N, 32).astype(np.float32), dtype)
    gv = jnp.asarray((rs.rand(2, N) < 0.45).astype(np.float32))
    t = timeit(lambda a: multiview_cosine_fuse(a, gv), gf, K=K)
    print(f"cosine fuse only (1 scale):         {t:7.2f} ms")


if __name__ == "__main__":
    main()
