"""Optimizer: AdamW + MultiStep LR + global-norm clipping, via optax.

Reference: OccDepth.configure_optimizers (occdepth/models/OccDepth.py:582-600
— AdamW(lr, weight_decay), MultiStepLR milestones [18, 24] gamma 0.4, or
[20]/0.1 for tartanair) and Lightning's `gradient_clip_val` (scripts/
train.py:188 — clip_grad_norm with max_norm 35).
"""
from __future__ import annotations

from typing import Sequence

import optax

from occdepth_tpu.config import OccDepthConfig


def multistep_lr(
    base_lr: float, milestones_steps: Sequence[int], gamma: float
) -> optax.Schedule:
    """Piecewise-constant LR: base_lr * gamma^{#milestones passed}."""
    boundaries = {int(s): gamma for s in milestones_steps}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def lr_schedule(cfg: OccDepthConfig, steps_per_epoch: int) -> optax.Schedule:
    """The LR schedule alone (for the LR monitor, scripts/train.py:151)."""
    if cfg.dataset == "tartanair":
        milestones, gamma = (20,), 0.1
    else:
        milestones, gamma = (18, 24), 0.4
    return multistep_lr(
        cfg.lr, [m * steps_per_epoch for m in milestones], gamma
    )


def make_optimizer(cfg: OccDepthConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    schedule = lr_schedule(cfg, steps_per_epoch)
    chain = []
    if cfg.gradient_clip_val and cfg.gradient_clip_val > 0:
        chain.append(optax.clip_by_global_norm(cfg.gradient_clip_val))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
        )
    )
    return optax.chain(*chain)
