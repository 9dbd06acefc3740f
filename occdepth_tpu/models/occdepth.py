"""OccDepth top-level model: 2D backbone -> SFA lift (-> OAD) -> 3D UNet.

Functional flax rewrite of the reference LightningModule's forward path
(occdepth/models/OccDepth.py:208-376).  All shapes are static; per-sample
python loops become vmaps; the ragged per-sample calibration lists become
batched (B, V, ...) arrays.

Batch schema (channels-last, all fixed-shape):
    img:            (B, V, H, W, 3) normalized RGB
    projected_pix:  (B, Vl, N, P, 2) int32 full-res pattern pixels at
                    project_scale (Vl = lift views, incl. NYU virtual view)
    fov_mask:       (B, Vl, N, P) bool
    cam_k:          (B, V, 3, 3)
    T_velo_2_cam:   (B, V, 4, 4)
    ida_mats:       (B, V, 4, 4)
    vox_origin:     (B, 3) (NYU/tartanair) — optional
    gt_depth:       (B, Vd, H, W) — optional (depth supervision)
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.models.flosp_depth import FlospDepth
from occdepth_tpu.models.sfa import sfa_lift
from occdepth_tpu.models.unet2d import UNet2D
from occdepth_tpu.models.unet3d import UNet3DKitti, UNet3DNYU
from occdepth_tpu.ops.grid_sample import grid_sample_2d
from occdepth_tpu.ops.resize import resize_bilinear


def _virtual_view(
    feat: jnp.ndarray,  # (B, h, w, C) left-view features at one scale
    gt_depth: jnp.ndarray,  # (B, 1, H, W) metric depth
    scale: int,
    bf: jnp.ndarray,  # () baseline * focal
) -> jnp.ndarray:
    """Synthesize right-view features by disparity warping.

    Reference OccDepth.generate_virtual_img (OccDepth.py:233-260), including
    its quirks: the sampling grid is built with `arange(-1, 1, 2/n)` (not the
    grid_sample align_corners=False centres) and sample 0's disparity map is
    broadcast over the whole batch (`grid_dx[0, ...]`, OccDepth.py:257).
    """
    B, h, w, C = feat.shape
    depth = resize_bilinear(
        gt_depth.transpose(0, 2, 3, 1), (h, w), align_corners=False
    )[..., 0]  # (B, h, w)
    bf_scale = bf / scale
    grid_dx = bf_scale / depth
    grid_dx = jnp.where(jnp.isinf(grid_dx), 0.0, grid_dx)
    grid_dx = grid_dx * 2.0 / w

    ys = -1.0 + (2.0 / h) * jnp.arange(h, dtype=jnp.float32)
    xs = -1.0 + (2.0 / w) * jnp.arange(w, dtype=jnp.float32)
    gx = jnp.broadcast_to(xs[None, :], (h, w)) + grid_dx[0]  # ref uses dx[0]
    gy = jnp.broadcast_to(ys[:, None], (h, w))
    grid = jnp.stack([gx, gy], axis=-1)  # (h, w, 2)

    warp = lambda f: grid_sample_2d(f, grid, "border", align_corners=False)
    return jax.vmap(warp)(feat)


class OccDepthModel(nn.Module):
    """End-to-end SSC model.  `cfg` is static (hashable dataclass)."""

    cfg: OccDepthConfig

    def backbone_features(
        self, unet2d_cls, unet2d_kwargs, img, dtype, train: bool
    ) -> Dict[str, jnp.ndarray]:
        """Run the 2D backbone over the (B, V, H, W, 3) views.

        Overridable hook: models/experimental.py swaps in alternative
        view-batching strategies for bench measurements without touching
        this shipping Module.
        """
        cfg = self.cfg
        B, V = img.shape[0], img.shape[1]
        unet2d = unet2d_cls(**unet2d_kwargs)
        x_rgb: Dict[str, jnp.ndarray] = {}
        if train and V > 1:
            # Per-view backbone calls in training — the reference's exact
            # structure (process_rgbs runs net_rgb per view,
            # OccDepth.py:208-231): BatchNorm batch statistics are
            # per-view (not joint over B*V), and with
            # share_2d_backbone_gradient the no-grad views' entire
            # backward sub-graph is dead code XLA removes — the batched
            # call could only zero their cotangents, still paying the
            # full backward.  Also dodges the batch>=2 layout tax
            # (bench: 2-view fwd+bwd 109 -> 84 ms before the DCE win).
            per_view = []
            for view in range(V):
                f = unet2d(img[:, view].astype(dtype), train)
                if cfg.share_2d_backbone_gradient and view > 0:
                    f = jax.tree_util.tree_map(jax.lax.stop_gradient, f)
                per_view.append(f)
            for k in per_view[0]:
                x_rgb[k] = jnp.stack([f[k] for f in per_view], axis=1)
        else:
            flat = img.reshape((B * V,) + img.shape[2:]).astype(dtype)
            feats = unet2d(flat, train)  # dict of (B*V, h, w, C)
            for k, v in feats.items():
                v = v.reshape((B, V) + v.shape[1:])
                if cfg.share_2d_backbone_gradient and V > 1:
                    # views > 0 contribute no backbone gradient
                    # (OccDepth.py:213-216)
                    v = jnp.concatenate(
                        [v[:, :1], jax.lax.stop_gradient(v[:, 1:])], axis=1
                    )
                x_rgb[k] = v
        return x_rgb

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        dtype = (
            jnp.bfloat16 if (cfg.compute_dtype == "bfloat16") else jnp.float32
        )
        from occdepth_tpu.ops.pallas_kernels import pallas_enabled

        use_pallas = pallas_enabled(cfg)
        img = batch["img"]
        B, V = img.shape[0], img.shape[1]

        # ---- 2D backbone over views (OccDepth.process_rgbs, :208-231) ----
        unet2d_cls = UNet2D
        if cfg.remat_backbone:
            # rematerialize backbone activations in backward (trades FLOPs
            # for HBM; for the b7/feature-64 high-capacity configs)
            unet2d_cls = nn.remat(UNet2D, static_argnums=(2,))
        unet2d_kwargs = dict(
            backbone_2d_name=cfg.backbone_2d_name,
            out_feature=cfg.feature_2d_oc,
            return_up_feats=cfg.return_up_feats,
            dtype=dtype,
            conv_impl=getattr(cfg, "decoder_conv_impl", "auto"),
            dw_grad=getattr(cfg, "dw_conv_grad", "xla"),
            name="net_rgb",
        )
        x_rgb = self.backbone_features(
            unet2d_cls, unet2d_kwargs, img, dtype, train
        )

        if cfg.stage_barriers:
            # pin the backbone/lift boundary: the scheduler may not fuse or
            # reorder across it (differentiable identity; see config.py)
            keys = sorted(x_rgb)
            vals = jax.lax.optimization_barrier(
                tuple(x_rgb[k] for k in keys)
            )
            x_rgb = dict(zip(keys, vals))

        # ---- NYU virtual right view from RGB-D (OccDepth.py:222-260) ----
        if cfg.dataset == "NYU" and cfg.use_depth_gt and "gt_depth" in batch:
            bf = batch["virtual_bf"].reshape(-1)[0].astype(jnp.float32)
            gt_depth = batch["gt_depth"].astype(jnp.float32)  # (B, 1, H, W)
            for scale in cfg.project_res:
                key = f"1_{scale}"
                virt = _virtual_view(
                    x_rgb[key][:, 0].astype(jnp.float32), gt_depth, scale, bf
                ).astype(dtype)
                x_rgb[key] = jnp.concatenate(
                    [x_rgb[key], virt[:, None]], axis=1
                )

        # ---- FLoSP lifting (SFA) ----
        # gathers run in the compute dtype (bf16 halves the gather traffic);
        # the cosine fusion upcasts to fp32 internally
        lift_feats = {
            f"1_{s}": x_rgb[f"1_{s}"].astype(dtype)
            for s in cfg.project_res
        }
        for s in cfg.sfa_bwd_stop_scales:  # bench attribution knob
            if f"1_{s}" in lift_feats:
                lift_feats[f"1_{s}"] = jax.lax.stop_gradient(
                    lift_feats[f"1_{s}"]
                )
        scene_dims = cfg.scene_dims(cfg.project_scale)
        x3d = sfa_lift(
            lift_feats,
            batch["projected_pix"],
            batch["fov_mask"],
            cfg.project_res,
            scene_dims,
            cfg.dataset,
            use_pallas=use_pallas,
            unroll_gathers=cfg.unroll_gathers,
        )  # (B, X, Y, Z, C) fp32

        if cfg.stage_barriers:
            x3d = jax.lax.optimization_barrier(x3d)

        out: Dict[str, jnp.ndarray] = {}

        # ---- OAD depth branch (flosp_depth) ----
        if cfg.trans_2d_to_3d == "flosp_depth":
            fd_conf = cfg.flosp_depth_conf
            rgb_key = f"1_{fd_conf.downsample_factor}"
            n_depth_views = 1 if cfg.dataset == "NYU" else V
            img_feat = x_rgb[rgb_key][:, :n_depth_views]
            fd = FlospDepth(
                conf=fd_conf,
                project_scale=cfg.project_scale,
                scene_size=cfg.full_scene_size,
                dataset=cfg.dataset,
                return_depth=cfg.with_depth_gt,
                dtype=dtype,
                unroll_gathers=cfg.unroll_gathers,
                name="flosp_depth",
            )
            result = fd(
                img_feat,
                batch["cam_k"][:, :n_depth_views],
                batch["T_velo_2_cam"][:, :n_depth_views],
                batch["ida_mats"][:, :n_depth_views],
                vox_origin=batch.get("vox_origin"),
                train=train,
            )
            if cfg.with_depth_gt:
                x3d_depth, depth_pred = result
                out["depth_pred"] = depth_pred
            else:
                x3d_depth = result
            x3d = x3d * x3d_depth.astype(x3d.dtype) * 100.0  # OccDepth.py:339

        # ---- 3D UNet decoder ----
        if cfg.dataset == "NYU":
            net3d = UNet3DNYU(
                n_classes=cfg.n_classes,
                feature=cfg.feature,
                full_scene_size=cfg.full_scene_size,
                context_prior=cfg.context_prior,
                n_relations=cfg.n_relations,
                cascade_cls=cfg.cascade_cls,
                use_pallas=use_pallas,
                remat_heads=getattr(cfg, "remat_heads", False),
                dtype=dtype,
                name="net_3d_decoder",
            )
        else:
            net3d = UNet3DKitti(
                n_classes=cfg.n_classes,
                feature=cfg.feature,
                full_scene_size=cfg.full_scene_size,
                project_scale=cfg.project_scale,
                context_prior=cfg.context_prior,
                n_relations=cfg.n_relations,
                cascade_cls=cfg.cascade_cls,
                occluded_cls=cfg.occluded_cls,
                use_pallas=use_pallas,
                layout_pin=getattr(cfg, "layout_pin", "off"),
                remat_heads=getattr(cfg, "remat_heads", False),
                dtype=dtype,
                name="net_3d_decoder",
            )
        x3d = x3d.astype(dtype)
        if not train and B > 1 and jax.device_count() == 1 and cfg.eval_unroll:
            # XLA's layout assignment goes pathological on the full-scale
            # 3D tensors at batch >= 2 (measured 12.6 -> 149 ms for the 3D
            # UNet at batch 2: multi-GB lane-padded copies around the
            # transpose-conv/head stages; every individual conv is fast at
            # either batch).  Unrolling the decoder per sample keeps every
            # sub-graph at the known-good batch-1 shapes; the module
            # instance is called repeatedly so parameters are shared, and
            # eval-mode BN is frozen so the math is identical.  Training
            # keeps the batched call (per-chip batch is 1 under DP), and
            # multi-device meshes keep it too — slicing a data-sharded
            # batch per sample would make GSPMD replicate the decoder
            # instead of partitioning it.
            per_sample = [
                net3d(x3d[i: i + 1], train=False) for i in range(B)
            ]
            net_out = {
                k: jnp.concatenate([o[k] for o in per_sample], axis=0)
                for k in per_sample[0]
            }
        else:
            net_out = net3d(x3d, train=train)
        for k, v in net_out.items():
            out[k] = v.astype(jnp.float32) if k.endswith("logit") else v
        if "P_logits" in net_out:
            out["P_logits"] = net_out["P_logits"].astype(jnp.float32)
        return out


def eval_apply(
    model: OccDepthModel,
    variables: Dict[str, Any],
    batch: Dict[str, jnp.ndarray],
    unroll: Optional[bool] = None,
) -> Dict[str, jnp.ndarray]:
    """Eval-mode apply, per-sample-unrolled on a single device.

    Generalizes the in-model 3D-decoder unroll (see __call__ above) to the
    WHOLE forward: at eval batch >= 2 on one chip, XLA's layout assignment
    regresses several full-grid stages (measured 29 -> 41 ms/frame even
    with the decoder unrolled); applying the functional model once per
    sample inside the same jit keeps every sub-graph at the known-good
    batch-1 shapes while still amortizing one dispatch over B frames.
    Parameters are shared by construction (same `variables` pytree).

    Skipped (batched apply) when:
      * B == 1 — nothing to unroll;
      * multiple devices — per-chip batch is 1 under data parallelism, and
        slicing a data-sharded batch would make GSPMD replicate the model;
      * NYU with use_depth_gt — the reference broadcasts sample 0's
        disparity over the whole batch in generate_virtual_img
        (OccDepth.py:257), so per-sample unrolling would change batched
        eval numerics; parity wins there.
    """
    B = batch["img"].shape[0]
    cfg = model.cfg
    if unroll is None:
        unroll = (
            B > 1
            and cfg.eval_unroll
            and jax.device_count() == 1
            and not (cfg.dataset == "NYU" and cfg.use_depth_gt)
        )
    if not unroll or B == 1:
        return model.apply(variables, batch, train=False)
    outs = [
        model.apply(
            variables,
            {k: v[i: i + 1] for k, v in batch.items()},
            train=False,
        )
        for i in range(B)
    ]
    return {
        k: jnp.concatenate([o[k] for o in outs], axis=0) for k in outs[0]
    }
