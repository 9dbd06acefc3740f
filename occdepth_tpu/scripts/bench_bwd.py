"""Per-component BACKWARD timing of the flagship forward, amortized.

For each stage, times value_and_grad of sum(stage(x)) wrt its float
inputs (and params where relevant) with the chained-repeats methodology.

    python -m occdepth_tpu.scripts.bench_bwd [--repeats 6]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.models.efficientnet import EfficientNetEncoder
from occdepth_tpu.models.flosp_depth import FlospDepth
from occdepth_tpu.models.sfa import sfa_lift
from occdepth_tpu.models.unet2d import UNet2D
from occdepth_tpu.models.unet3d import UNet3DKitti
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    K = args.repeats

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=False, compute_dtype=args.dtype,
    )
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=False)
    rng = jax.random.PRNGKey(0)

    def g(fn):
        """value-and-grad wrt arg 0 (params), reduced to a scalar pytree."""
        def h(p, *a):
            grads = jax.grad(
                lambda pp: jnp.sum(fn(pp, *a).astype(jnp.float32))
            )(p)
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(grads)
            )
        return h

    img = jnp.asarray(batch["img"].reshape(2, 370, 1220, 3), dtype)

    # 2D UNet fwd+bwd (params grad)
    unet2d = UNet2D(cfg.backbone_2d_name, cfg.feature_2d_oc,
                    cfg.return_up_feats, dtype=dtype)
    v2d = jax.jit(unet2d.init, static_argnames=("train",))(rng, img, train=False)
    t = timeit(g(lambda v, x: unet2d.apply(v, x, train=False)["1_1"]),
               v2d, img, K=K)
    print(f"2D UNet fwd+bwd:        {t:7.1f} ms", flush=True)

    # encoder only
    enc = EfficientNetEncoder(cfg.backbone_2d_name, dtype=dtype)
    venc = jax.jit(enc.init, static_argnames=("train",))(rng, img, train=False)
    t = timeit(g(lambda v, x: enc.apply(v, x, train=False)[-1]),
               venc, img, K=K)
    print(f"2D encoder fwd+bwd:     {t:7.1f} ms", flush=True)

    # SFA lift fwd+bwd (grad wrt the 2D features)
    feats2d = jax.jit(
        lambda x: unet2d.apply(v2d, x, train=False)
    )(img)
    lift_feats = {
        k: jnp.asarray(v, dtype)[None].reshape((1, 2) + v.shape[1:])
        for k, v in feats2d.items() if k in ("1_1", "1_2", "1_4", "1_8")
    }
    pix = jnp.asarray(batch["projected_pix"])
    fov = jnp.asarray(batch["fov_mask"])
    t = timeit(g(lambda lf: sfa_lift(
        lf, pix, fov, cfg.project_res, cfg.scene_dims(cfg.project_scale),
        "kitti")), lift_feats, K=K)
    print(f"SFA lift fwd+bwd:       {t:7.1f} ms", flush=True)

    # OAD fwd+bwd (params + input grads)
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
    t = timeit(g(lambda v, x: fd.apply(v, x, cam_k, t_v2c, ida, train=False)),
               vfd, img_feat, K=K)
    print(f"OAD fwd+bwd:            {t:7.1f} ms", flush=True)

    # 3D UNet fwd+bwd
    net3d = UNet3DKitti(
        n_classes=cfg.n_classes, feature=cfg.feature,
        full_scene_size=cfg.full_scene_size,
        project_scale=cfg.project_scale, context_prior=cfg.context_prior,
        cascade_cls=cfg.cascade_cls, dtype=dtype,
    )
    x3d = jax.random.normal(rng, (1, 128, 128, 16, cfg.feature), dtype)
    v3d = jax.jit(net3d.init, static_argnames=("train",))(rng, x3d, train=False)
    t = timeit(g(lambda v, x: net3d.apply(v, x, train=False)["ssc_logit"]),
               v3d, x3d, K=K)
    print(f"3D UNet fwd+bwd:        {t:7.1f} ms", flush=True)

    # SSC head alone at the FULL 256x256x32 grid (the largest full-grid
    # stage: conv0 -> 3-dilation ASPP -> cascade occ/class convs) — the
    # profile attributes ~17 GB of the step's HBM traffic here
    from occdepth_tpu.models.unet3d_blocks import SegmentationHead

    head = SegmentationHead(
        cfg.feature // 2, cfg.n_classes, (1, 2, 3), cascade_cls=True,
        dtype=dtype,
    )
    xh = jax.random.normal(rng, (1, 256, 256, 32, cfg.feature // 2), dtype)
    vh = jax.jit(head.init, static_argnames=("train",))(rng, xh, train=False)
    t = timeit(g(lambda v, x: head.apply(v, x, train=False)[0]),
               vh, xh, K=K)
    print(f"SSC head fwd+bwd:       {t:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
