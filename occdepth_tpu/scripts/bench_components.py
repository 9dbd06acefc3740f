"""Per-component timing of the flagship forward pass on the local device.

Times each stage in isolation (2D backbone x views, SFA lift, OAD depth
branch, 3D UNet) so optimization effort goes to the real hotspot.

    python -m occdepth_tpu.scripts.bench_components [--iters 10]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.models.flosp_depth import FlospDepth
from occdepth_tpu.models.sfa import sfa_lift
from occdepth_tpu.models.unet2d import UNet2D
from occdepth_tpu.models.unet3d import UNet3DKitti
from occdepth_tpu.utils.compilation_cache import enable


def _scalarize(out):
    """Reduce any output pytree to one fp32 scalar (forces full compute)."""
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def timeit(fn, *args, iters=10, vary=0):
    """Times fn with a per-iteration host fetch of a scalar: the axon proxy
    acks async dispatches without completion and replays identical
    executions, so honest timing needs distinct inputs AND a synchronous
    round trip per step."""
    variants = []
    for i in range(min(iters, 8)):
        a = list(args)
        x = a[vary]
        if isinstance(x, dict):
            x = {k: (v + (i + 1) * 1e-3 if v.dtype.kind == "f" else v)
                 for k, v in x.items()}
        else:
            x = x + (i + 1) * 1e-3
        a[vary] = x
        variants.append(jax.device_put(tuple(a)))
    g = jax.jit(lambda *a: _scalarize(fn(*a)))
    float(g(*variants[0]))  # compile
    t0 = time.perf_counter()
    for i in range(iters):
        float(g(*variants[i % len(variants)]))
    return (time.perf_counter() - t0) / iters * 1000  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()

    # measure the tunnel round-trip so component times can be interpreted
    triv = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(jnp.float32(0))
    float(triv(x))
    t0 = time.perf_counter()
    for _ in range(10):
        x = triv(x)
        float(x)
    print(f"dispatch+fetch RTT:  {(time.perf_counter() - t0) / 10 * 1000:8.2f} ms")

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=False,
        compute_dtype=args.dtype,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=False)
    rng = jax.random.PRNGKey(0)

    # full model
    model = OccDepthModel(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, batch, train=False
    )
    full = jax.jit(lambda v, b: model.apply(v, b, train=False)["ssc_logit"])
    t_full = timeit(full, variables, batch, iters=args.iters, vary=1)
    print(f"full forward:        {t_full:8.2f} ms")

    # 2D backbone (x2 views)
    unet2d = UNet2D(cfg.backbone_2d_name, cfg.feature_2d_oc,
                    cfg.return_up_feats, dtype=dtype)
    img = jnp.asarray(batch["img"].reshape(2, 370, 1220, 3), dtype)
    v2d = jax.jit(unet2d.init, static_argnames=("train",))(rng, img, train=False)
    f2d = jax.jit(lambda v, x: unet2d.apply(v, x, train=False))
    t_2d = timeit(f2d, v2d, img, iters=args.iters, vary=1)
    print(f"2D backbone (2 views): {t_2d:6.2f} ms")

    feats = f2d(v2d, img)

    # SFA lift
    lift_feats = {
        k: jnp.asarray(v, dtype)[None].reshape((1, 2) + v.shape[1:])
        for k, v in feats.items() if k in ("1_1", "1_2", "1_4", "1_8")
    }
    pix = jnp.asarray(batch["projected_pix"])
    fov = jnp.asarray(batch["fov_mask"])
    sfa = jax.jit(lambda lf, p, f: sfa_lift(
        lf, p, f, cfg.project_res, cfg.scene_dims(cfg.project_scale), "kitti"
    ))
    t_sfa = timeit(sfa, lift_feats, pix, fov, iters=args.iters, vary=0)
    print(f"SFA lift (4 scales):   {t_sfa:6.2f} ms")

    # OAD depth branch
    fd = FlospDepth(
        conf=cfg.flosp_depth_conf, project_scale=cfg.project_scale,
        scene_size=cfg.full_scene_size, dataset="kitti", return_depth=False,
        dtype=dtype,
    )
    img_feat = lift_feats["1_8"].astype(dtype)
    cam_k = jnp.asarray(batch["cam_k"])
    t_v2c = jnp.asarray(batch["T_velo_2_cam"])
    ida = jnp.asarray(batch["ida_mats"])
    vfd = fd.init(rng, img_feat, cam_k, t_v2c, ida, train=False)
    ffd = jax.jit(lambda v, *a: fd.apply(v, *a, train=False))
    t_fd = timeit(ffd, vfd, img_feat, cam_k, t_v2c, ida, iters=args.iters, vary=1)
    print(f"OAD depth branch:      {t_fd:6.2f} ms")

    # 3D UNet
    net3d = UNet3DKitti(
        n_classes=cfg.n_classes, feature=cfg.feature,
        full_scene_size=cfg.full_scene_size,
        project_scale=cfg.project_scale, context_prior=cfg.context_prior,
        cascade_cls=cfg.cascade_cls, dtype=dtype,
    )
    x3d = jax.random.normal(
        rng, (1, 128, 128, 16, cfg.feature), dtype
    )
    v3d = jax.jit(net3d.init, static_argnames=("train",))(rng, x3d, train=False)
    f3d = jax.jit(lambda v, x: net3d.apply(v, x, train=False)["ssc_logit"])
    t_3d = timeit(f3d, v3d, x3d, iters=args.iters, vary=1)
    print(f"3D UNet+CRP+heads:     {t_3d:6.2f} ms")

    print(f"sum of parts:          {t_2d + t_sfa + t_fd + t_3d:6.2f} ms")


if __name__ == "__main__":
    main()
