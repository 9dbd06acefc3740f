"""Bench-only model variants, quarantined out of the shipping Module.

These subclasses exist solely for measurement CLIs (scripts/bench_train.py
and friends); none is checkpoint-compatible with OccDepthModel and none is
selected by the production trainer unless the corresponding experiment
knob is set explicitly.  Measured results live in docs/DESIGN.md.
"""
from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from occdepth_tpu.models.occdepth import OccDepthModel


class OccDepthViewVmap(OccDepthModel):
    """EXPERIMENT (bench_train --view-vmap; VERDICT r3 next-#5, measured
    and REJECTED in round 4: 272 vs 197 ms/step — docs/DESIGN.md).

    vmap the 2D backbone over the view axis in training — one batched
    graph for XLA to schedule instead of V sequential per-view calls,
    while BN batch statistics stay per-view by construction
    (variable_axes maps batch_stats over views).  Caveats that keep this
    a measurement knob, not a shipping path: the batch_stats pytree gains
    a leading view axis (not checkpoint-compatible, init must run
    train=True), running-stat updates are per-view-parallel rather than
    the reference's sequential folding, and with share_2d_backbone_gradient
    the no-grad views' backward can no longer be DCE'd out of the batched
    graph (XLA cannot split a batched conv) — the cotangents are merely
    zeroed below.
    """

    def backbone_features(
        self, unet2d_cls, unet2d_kwargs, img, dtype, train: bool
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        V = img.shape[1]
        if not (train and V > 1):
            return super().backbone_features(
                unet2d_cls, unet2d_kwargs, img, dtype, train
            )
        vm_cls = nn.vmap(
            unet2d_cls,
            in_axes=(1, None), out_axes=1,
            variable_axes={"params": None, "batch_stats": 0},
            split_rngs={"params": False},
        )
        feats = vm_cls(**unet2d_kwargs)(img.astype(dtype), train)
        x_rgb: Dict[str, jnp.ndarray] = {}
        for k, v in feats.items():  # (B, V, h, w, C)
            if cfg.share_2d_backbone_gradient:
                v = jnp.concatenate(
                    [v[:, :1], jax.lax.stop_gradient(v[:, 1:])], axis=1
                )
            x_rgb[k] = v
        return x_rgb
