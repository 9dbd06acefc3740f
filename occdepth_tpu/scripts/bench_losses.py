"""Amortized per-loss DEVICE timing at the flagship config.

    python -m occdepth_tpu.scripts.bench_losses [--grad]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.data.params import class_weights_for
from occdepth_tpu.losses import (
    ce_ssc_loss,
    depth_cls_loss,
    geo_scal_loss,
    relation_loss,
    sem_scal_loss,
)
from occdepth_tpu.losses.fp_device import frustum_proportion_loss_device
from occdepth_tpu.losses.metrics import confusion_update
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--grad", action="store_true",
                    help="time value+grad wrt logits instead of forward")
    args = ap.parse_args()
    enable()
    K = args.repeats

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=True, compute_dtype="bfloat16",
    )
    batch = make_synthetic_batch(cfg, batch_size=1, seed=0)
    rng = jax.random.PRNGKey(0)
    X, Y, Z = cfg.full_scene_size
    logits = jax.random.normal(rng, (1, X, Y, Z, cfg.n_classes), jnp.float32)
    occ_logits = jax.random.normal(rng, (1, X, Y, Z, 2), jnp.float32)
    p_logits = jax.random.normal(rng, (1, 4, 4096, 512), jnp.float32)
    depth_pred = jax.nn.softmax(
        jax.random.normal(rng, (1, 1, 47, 153, 104), jnp.float32), axis=-1
    )
    target = jnp.asarray(batch["target"])
    cw = jnp.asarray(class_weights_for("kitti"))
    fd = cfg.flosp_depth_conf

    def wrap(fn):
        if not args.grad:
            return fn
        return lambda lg, *a: jax.grad(
            lambda l: fn(l, *a).astype(jnp.float32)
        )(lg).sum()

    items = [
        ("ce_ssc", wrap(lambda lg: ce_ssc_loss(lg, target, cw)), logits),
        ("ce_occ(2cl)", wrap(lambda lg: ce_ssc_loss(
            lg, jnp.where((target != 0) & (target != 255), 1, target),
            jnp.ones((2,)))), occ_logits),
        ("sem_scal", wrap(lambda lg: sem_scal_loss(lg, target)), logits),
        ("geo_scal", wrap(lambda lg: geo_scal_loss(lg, target)), logits),
        ("relation", wrap(lambda lg: relation_loss(
            lg, jnp.asarray(batch["CP_mega_matrices"]))), p_logits),
        ("depth_cls", wrap(lambda dp: depth_cls_loss(
            jnp.asarray(batch["gt_depth"]), dp, fd.downsample_factor,
            fd.d_bound)), depth_pred),
        ("fp_device", wrap(lambda lg: frustum_proportion_loss_device(
            cfg, lg, batch)), logits),
        ("confusion", lambda lg: confusion_update(
            jnp.argmax(lg, -1), target, cfg.n_classes)[1], logits),
    ]
    for name, fn, arg in items:
        try:
            t = timeit(fn, arg, K=K)
            print(f"{name:12s} {t:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:12s} FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
