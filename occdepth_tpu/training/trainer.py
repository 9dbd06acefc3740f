"""Training driver: data -> sharded train steps -> metrics/checkpoints.

TPU replacement for PyTorch Lightning's Trainer + the OccDepth
LightningModule's step/epoch plumbing (reference scripts/train.py:140-208,
models/OccDepth.py:535-600): one process drives the whole mesh (GSPMD), so
there is no DDP process group, no sync_batchnorm wrapper, no sync_dist —
those all fall out of jit-with-sharded-batch.
"""
from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.params import class_names_for
from occdepth_tpu.losses.metrics import SSCMetrics
from occdepth_tpu.parallel import make_hybrid_mesh, make_mesh, shard_batch
from occdepth_tpu.training.checkpoint import CheckpointManager
from occdepth_tpu.training.logging import MetricsLogger
from occdepth_tpu.training.optim import lr_schedule, make_optimizer
from occdepth_tpu.training.step import (
    TrainState,
    init_state,
    make_eval_step,
    make_train_step,
)


def exp_name(cfg: OccDepthConfig) -> str:
    """Experiment directory name from config flags (scripts/train.py:38-62)."""
    parts = [
        cfg.exp_prefix,
        cfg.dataset,
        f"{cfg.full_scene_size[0]}x{cfg.full_scene_size[1]}x{cfg.full_scene_size[2]}",
        cfg.trans_2d_to_3d,
        cfg.backbone_2d_name,
        f"f{cfg.feature}",
    ]
    if cfg.context_prior:
        parts.append("crp")
    if cfg.cascade_cls:
        parts.append("cascade")
    if cfg.occluded_cls:
        # occluded head changes the param tree — must not share a
        # checkpoint dir (auto-resume) with a non-occluded run
        parts.append("occluded")
    if cfg.with_depth_gt:
        parts.append("depthgt")
    parts.append(f"run{cfg.run}")
    return "_".join(parts)


def make_datasets(cfg: OccDepthConfig):
    if cfg.dataset == "kitti":
        from occdepth_tpu.data.kitti import KittiDataset

        return (
            KittiDataset(cfg, "train", fliplr=0.5),
            KittiDataset(cfg, "val", fliplr=0.0),
        )
    if cfg.dataset == "NYU":
        from occdepth_tpu.data.nyu import NYUDataset

        return (
            NYUDataset(cfg, "train", fliplr=0.5),
            NYUDataset(cfg, "test", fliplr=0.0),
        )
    if cfg.dataset == "tartanair":
        from occdepth_tpu.data.tartanair import TartanAirDataset

        return (
            TartanAirDataset(cfg, "train", fliplr=0.5),
            TartanAirDataset(cfg, "val", fliplr=0.0),
        )
    raise ValueError(cfg.dataset)


def nominal_total_batches(steps_per_epoch: int) -> int:
    """Denominator of the sem-step-decay progress fraction.

    The reference pins it to a NOMINAL 30-epoch schedule independent of
    the configured max_epochs — hardcoded dataset lengths x 30
    (OccDepth.py:140-147: ``(3834 // batch_size) * 30`` for KITTI,
    ``(795 // batch_size) * 30`` for NYU).  We derive the per-epoch step
    count from the real dataset length (so toy/subset runs scale), but
    keep the x30 constant: runs with max_epochs != 30 intentionally see
    the same decay-vs-step curve as the reference, NOT a curve stretched
    to their own epoch budget.
    """
    return steps_per_epoch * 30


def strip_metadata(batch: Dict) -> Dict:
    return {k: v for k, v in batch.items() if k not in ("frame_id", "sequence")}


class Trainer:
    def __init__(self, cfg: OccDepthConfig, logdir: Optional[str] = None):
        self.cfg = cfg
        self.logdir = os.path.join(logdir or cfg.logdir, exp_name(cfg))
        os.makedirs(self.logdir, exist_ok=True)
        if cfg.n_slices > 1:
            self.mesh = make_hybrid_mesh(cfg.n_slices)
        else:
            self.mesh = make_mesh(jax.devices(), ("data",))
        self.n_devices = len(jax.devices())
        self.global_batch = cfg.batch_size_per_gpu * self.n_devices
        self.metrics_logger = MetricsLogger(self.logdir)
        self.ckpt = CheckpointManager(os.path.join(self.logdir, "checkpoints"))
        self.class_names = class_names_for(cfg.dataset)

    def fit(self, train_ds=None, val_ds=None, max_steps: Optional[int] = None):
        from occdepth_tpu.data.kitti import Loader

        cfg = self.cfg
        if train_ds is None or val_ds is None:
            train_ds, val_ds = make_datasets(cfg)
        for name, ds in (("train", train_ds), ("val", val_ds)):
            if len(ds) == 0:
                raise RuntimeError(
                    f"{name} dataset is empty — check data_root="
                    f"{cfg.data_root!r} / data_preprocess_root="
                    f"{cfg.data_preprocess_root!r}"
                )
        train_loader = Loader(
            train_ds, self.global_batch, shuffle=True,
            num_workers=max(1, cfg.num_workers_per_gpu),
        )
        val_loader = Loader(
            val_ds, self.global_batch, shuffle=False, drop_last=False,
            num_workers=max(1, cfg.num_workers_per_gpu),
        )
        accum = max(1, cfg.accumulate_grad_batches)
        # one "step" = one optimizer update (= accum microbatches); a
        # trailing partial group at epoch end is dropped rather than
        # stepped short (Lightning steps on the remainder; configs ship
        # with accumulate_grad_batches=1 so this never differs in practice)
        steps_per_epoch = max(1, len(train_loader) // accum)
        total_batches = nominal_total_batches(steps_per_epoch)

        tx = make_optimizer(cfg, steps_per_epoch)
        example = strip_metadata(next(iter(val_loader)))
        state = init_state(cfg, jax.random.PRNGKey(42), example, tx)
        start_step = 0
        restored = self.ckpt.restore(state)
        if restored is not None:
            state = jax.tree_util.tree_map(jnp.asarray, restored)
            if not isinstance(state, TrainState):
                state = TrainState(**state) if isinstance(state, dict) else state
            start_step = int(state.step)
            print(f"resumed from step {start_step}")

        train_step = make_train_step(cfg, tx, accum)
        eval_step = make_eval_step(cfg)
        train_metrics = SSCMetrics(cfg.n_classes)
        lr_fn = lr_schedule(cfg, steps_per_epoch)

        step = start_step
        start_epoch = start_step // steps_per_epoch
        # resume determinism: the shuffle order is a pure function of the
        # epoch counter, so a resumed run replays the same order an
        # uninterrupted run would have used
        train_loader.epoch = start_epoch
        t_start = time.time()
        for epoch in range(start_epoch, cfg.max_epochs):
            if hasattr(train_ds, "reseed"):
                # advance the per-epoch augmentation stream (the reference's
                # seed_everything + worker_init_fn, scripts/train.py:213);
                # draws are per-(epoch, index) so they are deterministic
                # regardless of worker scheduling — the `deterministic`
                # config key needs no weaker mode
                train_ds.reseed(epoch)
            micro = []
            for batch in train_loader:
                micro.append(strip_metadata(batch))
                if len(micro) < accum:
                    continue
                if accum == 1:
                    batch = shard_batch(micro[0], self.mesh)
                else:
                    batch = shard_batch(
                        {k: np.stack([m[k] for m in micro])
                         for k in micro[0]},
                        self.mesh, batch_dim=1,
                    )
                micro = []
                progress = jnp.asarray(
                    min(1.0, step / total_batches), jnp.float32
                )
                state, logs, completion, conf = train_step(
                    state, batch, progress
                )
                train_metrics.merge_device(completion, conf)
                step += 1
                # log_every_n_steps <= 0 means "log every step" (and
                # guards the CLI-override path against ZeroDivisionError)
                if step % max(1, cfg.log_every_n_steps) == 0:
                    logs = {k: float(v) for k, v in logs.items()}
                    logs["steps_per_sec"] = step / max(
                        1e-9, time.time() - t_start
                    )
                    logs["lr"] = float(lr_fn(step))
                    self.metrics_logger.log(step, logs, prefix="train/")
                if max_steps is not None and step >= max_steps:
                    break

            # validation epoch
            val_stats = self.validate(state, val_loader, eval_step)
            stats = train_metrics.get_stats()
            epoch_logs = {
                "train/mIoU": stats["iou_ssc_mean"],
                "train/IoU": stats["iou"],
                "val/mIoU": val_stats["iou_ssc_mean"],
                "val/IoU": val_stats["iou"],
                "val/Precision": val_stats["precision"],
                "val/Recall": val_stats["recall"],
            }
            # per-class IoU at epoch end (reference OccDepth.py:542-557)
            for name, iou in zip(
                self.class_names, val_stats["iou_ssc"].tolist()
            ):
                epoch_logs[f"val/IoU_{name}"] = iou
            for k, v in val_stats.get("losses", {}).items():
                epoch_logs[f"val/{k}"] = v
            self.metrics_logger.log(step, epoch_logs)
            train_metrics.reset()
            self.ckpt.save(state, step, {
                "val/mIoU": val_stats["iou_ssc_mean"],
                "val/IoU": val_stats["iou"],
            })
            if max_steps is not None and step >= max_steps:
                break
        return state

    def validate(self, state: TrainState, val_loader, eval_step=None):
        """Full-val metrics + mean val losses.

        The final ragged batch (e.g. KITTI val = 795 frames, 795 % 8 != 0)
        is padded up to the global batch with repeated rows plus a
        `sample_valid` mask, so every step has the same static shape (no
        recompile) and padded rows never reach the confusion counts.  Val
        losses are averaged over the full batches only (padding would bias
        the loss mean).
        """
        if eval_step is None:
            eval_step = make_eval_step(self.cfg)
        metrics = SSCMetrics(self.cfg.n_classes)
        gb = self.global_batch
        loss_sums: Dict[str, float] = {}
        n_loss_batches = 0
        for batch in val_loader:
            batch = strip_metadata(batch)
            bs = next(iter(batch.values())).shape[0]
            valid = np.ones((gb,), bool)
            if bs < gb:
                valid[bs:] = False
                batch = {
                    k: np.concatenate([v] + [v[:1]] * (gb - bs))
                    for k, v in batch.items()
                }
            batch["sample_valid"] = valid
            batch = shard_batch(batch, self.mesh)
            logs, completion, conf = eval_step(
                state.params, state.batch_stats, batch
            )
            metrics.merge_device(completion, conf)
            if bs == gb:
                n_loss_batches += 1
                for k, v in logs.items():
                    loss_sums[k] = loss_sums.get(k, 0.0) + float(v)
        stats = metrics.get_stats()
        if n_loss_batches:
            stats["losses"] = {
                k: v / n_loss_batches for k, v in loss_sums.items()
            }
        return stats
