"""Loss assembly + jitted train/eval steps.

Functional rewrite of OccDepth.step (occdepth/models/OccDepth.py:378-533):
all loss terms are computed in one jitted function; the train step takes and
returns a TrainState (params, BN batch_stats, optimizer state) with donated
buffers.  Under a data-sharded batch and replicated state, GSPMD inserts the
gradient all-reduce and cross-replica BN statistics automatically — the
reference's DDP + sync_batchnorm without any comm code.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.params import class_weights_for, class_weights_occ_for
from occdepth_tpu.losses import (
    ce_ssc_loss,
    depth_cls_loss,
    frustum_proportion_loss,
    geo_scal_loss,
    relation_loss,
    sem_scal_loss,
)
from occdepth_tpu.losses.metrics import confusion_update
from occdepth_tpu.models import OccDepthModel


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def create_model(cfg: OccDepthConfig) -> OccDepthModel:
    if getattr(cfg, "view_vmap", False):
        # bench-only variant (models/experimental.py); not checkpoint-
        # compatible — selected here so the experiment stays out of the
        # shipping Module
        from occdepth_tpu.models.experimental import OccDepthViewVmap

        return OccDepthViewVmap(cfg=cfg)
    return OccDepthModel(cfg=cfg)


def init_state(
    cfg: OccDepthConfig,
    rng: jax.Array,
    batch,
    tx: optax.GradientTransformation,
    jit_init: bool = True,
) -> TrainState:
    """``jit_init=False`` runs init op-by-op (eager): slower per-op but
    skips the whole-init XLA compile — the right trade for one-shot gates
    on hosts where a full-model compile takes minutes (dryrun_multichip)."""
    model = create_model(cfg)
    # view_vmap batches the BN stats over views in train mode, so the
    # variables must be created by a train-mode trace (bench-only knob)
    init_train = bool(getattr(cfg, "view_vmap", False))
    if jit_init:
        variables = jax.jit(model.init, static_argnames=("train",))(
            rng, batch, train=init_train
        )
    else:
        variables = model.init(rng, batch, train=init_train)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def compute_losses(
    cfg: OccDepthConfig,
    out: Dict[str, jnp.ndarray],
    batch: Dict[str, jnp.ndarray],
    progress: jnp.ndarray,  # cur_batch / total_batch in [0, 1]
    is_test: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """All loss terms of OccDepth.step, gated by the (static) config flags."""
    logs: Dict[str, jnp.ndarray] = {}
    loss = jnp.zeros((), jnp.float32)
    ssc_logits = out["ssc_logit"]
    target = batch["target"]

    if cfg.context_prior and cfg.relation_loss:
        l_rel = relation_loss(out["P_logits"], batch["CP_mega_matrices"])
        loss += l_rel
        logs["loss_relation_ce_super"] = l_rel

    if cfg.CE_ssc_loss:
        cw = jnp.asarray(class_weights_for(cfg.dataset))
        l_ssc = ce_ssc_loss(ssc_logits, target, cw)
        loss += l_ssc
        logs["loss_ssc"] = l_ssc
        if cfg.cascade_cls:
            occ_target = jnp.where(
                (target != 0) & (target != 255), 1, target
            )
            cw_occ = jnp.asarray(class_weights_occ_for(cfg.dataset))
            l_occ = ce_ssc_loss(out["occ_logit"], occ_target, cw_occ)
            loss += l_occ
            logs["loss_occ"] = l_occ
        if cfg.occluded_cls and "occluded" in batch:
            l_occl = ce_ssc_loss(
                out["occluded_logit"], batch["occluded"],
                jnp.ones((2,), jnp.float32),
            )
            loss += l_occl
            logs["loss_occluded"] = l_occl

    if (
        cfg.with_depth_gt
        and cfg.trans_2d_to_3d == "flosp_depth"
        and "gt_depth" in batch
    ):
        depth_pred = out["depth_pred"]  # (B, V, h, w, D)
        if cfg.use_stereo_depth_gt:
            depth_pred = depth_pred[:, :1]  # left cam only (OccDepth.py:443)
        fd = cfg.flosp_depth_conf
        l_depth = depth_cls_loss(
            batch["gt_depth"], depth_pred, fd.downsample_factor, fd.d_bound
        ) * cfg.depth_loss_weight
        loss += l_depth
        logs["loss_depth"] = l_depth

    if cfg.sem_scal_loss:
        if cfg.sem_step_decay_loss:
            decay = jnp.maximum(0.1, 1.0 - progress)
        else:
            decay = 1.0
        l_sem = sem_scal_loss(ssc_logits, target) * decay
        loss += l_sem
        logs["loss_sem_scal"] = l_sem

    if cfg.geo_scal_loss:
        l_geo = geo_scal_loss(ssc_logits, target)
        loss += l_geo
        logs["loss_geo_scal"] = l_geo

    if cfg.fp_loss and not is_test and "frustums_class_dists" in batch:
        if "frustums_masks" in batch:
            l_fp = frustum_proportion_loss(
                ssc_logits, batch["frustums_masks"],
                batch["frustums_class_dists"],
            )
        else:
            # production path: masks rebuilt on device from the calib
            # matrices (kills the ~134 MB/sample host->device transfer)
            from occdepth_tpu.losses.fp_device import (
                frustum_proportion_loss_device,
            )

            l_fp = frustum_proportion_loss_device(cfg, ssc_logits, batch)
        loss += l_fp
        logs["loss_frustums"] = l_fp

    logs["loss"] = loss
    return loss, logs


def make_train_step(
    cfg: OccDepthConfig,
    tx: optax.GradientTransformation,
    accum_steps: int = 1,
):
    """Build the jitted train step (donate state; shard batch on `data`).

    With ``accum_steps`` K > 1 (Lightning's ``accumulate_grad_batches``,
    which the reference exposes through its Trainer) the step takes a
    batch pytree with a leading (K, B, ...) microbatch dim, scans the
    forward+backward over the K microbatches accumulating gradients, and
    applies ONE optimizer update on the mean gradient — Lightning's exact
    semantics (loss / K per microbatch).  BN running stats advance once
    per microbatch, as they do under Lightning.
    """
    model = create_model(cfg)

    if getattr(cfg, "remat_loss", False):
        # recompute the loss assembly's fp32 intermediates (softmax/
        # log-softmax/one-hot over the (B,X,Y,Z,C) grid, fp-loss chunk
        # masks) in the backward from the bf16 logits instead of storing
        # them — gradient-exact (identical math re-run), trades ~free VPU
        # recompute for fp32 full-grid store+load on an HBM-bound step
        losses_fn = jax.checkpoint(
            lambda out, batch, progress: compute_losses(
                cfg, out, batch, progress
            )
        )
    else:
        losses_fn = partial(compute_losses, cfg)

    def grads_and_aux(params, batch_stats, batch, progress):
        def loss_fn(params):
            out, new_model_state = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch,
                train=True,
                mutable=["batch_stats"],
            )
            loss, logs = losses_fn(out, batch, progress)
            return loss, (logs, new_model_state, out)

        grads, (logs, new_model_state, out) = jax.grad(
            loss_fn, has_aux=True
        )(params)
        y_pred = jnp.argmax(out["ssc_logit"], axis=-1)
        completion, conf = confusion_update(
            y_pred, batch["target"], cfg.n_classes
        )
        return grads, logs, new_model_state["batch_stats"], completion, conf

    def apply_update(state, grads, batch_stats, logs, completion, conf):
        updates, new_opt_state = tx.update(
            grads, state.opt_state, state.params
        )
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            batch_stats=batch_stats,
            opt_state=new_opt_state,
            step=state.step + 1,
        )
        return new_state, logs, completion, conf

    if accum_steps == 1:

        def train_step(state: TrainState, batch, progress):
            grads, logs, batch_stats, completion, conf = grads_and_aux(
                state.params, state.batch_stats, batch, progress
            )
            return apply_update(
                state, grads, batch_stats, logs, completion, conf
            )

    else:

        def train_step(state: TrainState, batches, progress):
            def micro(carry, mb):
                batch_stats, grad_sum, comp_sum, conf_sum = carry
                grads, logs, new_stats, completion, conf = grads_and_aux(
                    state.params, batch_stats, mb, progress
                )
                carry = (
                    new_stats,
                    jax.tree_util.tree_map(jnp.add, grad_sum, grads),
                    comp_sum + completion,
                    conf_sum + conf,
                )
                return carry, logs

            init = (
                state.batch_stats,
                jax.tree_util.tree_map(jnp.zeros_like, state.params),
                jnp.zeros((3,), jnp.int32),
                jnp.zeros((cfg.n_classes, cfg.n_classes), jnp.int32),
            )
            (batch_stats, grad_sum, completion, conf), logs_stack = (
                jax.lax.scan(micro, init, batches)
            )
            grads = jax.tree_util.tree_map(
                lambda g: g / accum_steps, grad_sum
            )
            logs = jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), logs_stack
            )
            return apply_update(
                state, grads, batch_stats, logs, completion, conf
            )

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(cfg: OccDepthConfig):
    """Validation step: losses + on-device confusion counts (no y_pred
    transfer — prediction dumps go through make_forward).

    An optional batch key `sample_valid` (B,) bool marks padding rows used
    to keep the final val batch static-shape (reference eval handles the
    ragged remainder dynamically, occdepth/scripts/eval.py:78-80); padded
    rows are excluded from the confusion counts.
    """
    model = create_model(cfg)

    def eval_step(params, batch_stats, batch):
        batch = dict(batch)
        sample_valid = batch.pop("sample_valid", None)
        out = model.apply(
            {"params": params, "batch_stats": batch_stats}, batch, train=False
        )
        _, logs = compute_losses(
            cfg, out, batch, jnp.zeros(()), is_test=True
        )
        y_pred = jnp.argmax(out["ssc_logit"], axis=-1)
        completion, conf = confusion_update(
            y_pred, batch["target"], cfg.n_classes, sample_valid
        )
        return logs, completion, conf

    return jax.jit(eval_step)


def make_forward(cfg: OccDepthConfig):
    """Pure inference forward: (variables, batch) -> out dict."""
    model = create_model(cfg)

    def forward(variables, batch):
        return model.apply(variables, batch, train=False)

    return jax.jit(forward)
