"""On-device SSC metrics (completion IoU + per-class semantic IoU).

Replaces the reference's per-step full-volume GPU->CPU numpy accumulator
(occdepth/loss/sscMetrics.py:40-204): the O(2M-voxel) confusion reduction
runs on device inside jit; only the tiny (C, C) counter matrix crosses to
the host each step, where it accumulates in int64 (device int32 would
overflow over an epoch).  Under a data-sharded batch the device reduction
sums over the mesh automatically (GSPMD) — the TPU equivalent of the
reference's `sync_dist=True`.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def confusion_update(
    y_pred: jnp.ndarray,  # (B, ...) int predicted labels
    y_true: jnp.ndarray,  # (B, ...) int targets (255 invalid)
    n_classes: int,
    sample_valid: jnp.ndarray = None,  # (B,) bool; False = padding sample
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch completion counts + semantic confusion matrix (device-side).

    Matches SSCMetrics.add_batch semantics (sscMetrics.py:70-204): voxels
    with target 255 are set to class 0 in both pred and target before
    counting (they count into conf[0, 0] like the reference).

    `sample_valid` marks batch rows that are padding (the static-shape
    replacement for Lightning's ragged final eval batch, eval.py:78-80):
    padded rows contribute nothing — not even to conf[0, 0].

    Returns:
        completion: (3,) int32 [tp, fp, fn] of binarized occupancy.
        conf: (C, C) int32 with conf[t, p] counts.
    """
    invalid = y_true == 255
    if sample_valid is not None:
        pad_row = ~sample_valid.reshape(
            sample_valid.shape + (1,) * (y_true.ndim - sample_valid.ndim)
        )
        invalid = invalid | pad_row
    t = jnp.where(invalid, 0, y_true).astype(jnp.int32).reshape(-1)
    p = jnp.where(invalid, 0, y_pred).astype(jnp.int32).reshape(-1)
    if sample_valid is not None:
        # padding voxels match no class one-hot (the chunk-pad sentinels)
        keep = jnp.broadcast_to(~pad_row, y_true.shape).reshape(-1)
        t = jnp.where(keep, t, -1)
        p = jnp.where(keep, p, -2)

    bt = t > 0
    bp = p > 0
    completion = jnp.stack([
        (bt & bp).sum(), (~bt & bp).sum(), (bt & ~bp).sum()
    ]).astype(jnp.int32)

    # one-hot matmul instead of bincount: a 2M-voxel bincount is a scatter
    # with ~5000x index collisions, which serializes on TPU (measured ~27 s
    # inside the train step); the (C, M) x (M, C) matmul runs on the MXU.
    # fp32 is exact only below 2^24 counts, so reduce in <=2M-voxel chunks
    # and accumulate in int32 (a full KITTI frame is exactly 2M voxels).
    classes = jnp.arange(n_classes, dtype=jnp.int32)
    chunk = 1 << 21
    pad = (-t.size) % chunk
    tc = jnp.pad(t, (0, pad), constant_values=-1).reshape(-1, chunk)
    pc = jnp.pad(p, (0, pad), constant_values=-2).reshape(-1, chunk)

    def chunk_conf(tt, pp):
        t_oh = (tt[:, None] == classes[None, :]).astype(jnp.float32)
        p_oh = (pp[:, None] == classes[None, :]).astype(jnp.float32)
        return jnp.einsum(
            "mc,md->cd", t_oh, p_oh, preferred_element_type=jnp.float32
        ).astype(jnp.int32)

    conf = jax.vmap(chunk_conf)(tc, pc).sum(axis=0, dtype=jnp.int32)
    return completion, conf


class SSCMetrics:
    """Host accumulator with the reference's add_batch/get_stats API."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self._update = jax.jit(confusion_update, static_argnums=2)
        self.reset()

    def reset(self):
        self.completion = np.zeros(3, np.int64)
        self.conf = np.zeros((self.n_classes, self.n_classes), np.int64)

    def add_batch(self, y_pred, y_true):
        comp, conf = self._update(
            jnp.asarray(y_pred), jnp.asarray(y_true), self.n_classes
        )
        self.completion += np.asarray(jax.device_get(comp), np.int64)
        self.conf += np.asarray(jax.device_get(conf), np.int64)

    def merge_device(self, completion, conf):
        """Accumulate counts already produced inside a jitted step."""
        self.completion += np.asarray(jax.device_get(completion), np.int64)
        self.conf += np.asarray(jax.device_get(conf), np.int64)

    def get_stats(self) -> Dict[str, np.ndarray]:
        """precision/recall/IoU/per-class IoU/mIoU (sscMetrics.py:93-109)."""
        tp, fp, fn = (float(x) for x in self.completion)
        if tp != 0:
            precision = tp / (tp + fp)
            recall = tp / (tp + fn)
            iou = tp / (tp + fp + fn)
        else:
            precision = recall = iou = 0.0
        conf = self.conf.astype(np.float64)
        tps = np.diag(conf)
        fps = conf.sum(0) - tps
        fns = conf.sum(1) - tps
        iou_ssc = tps / (tps + fps + fns + 1e-5)
        return {
            "precision": precision,
            "recall": recall,
            "iou": iou,
            "iou_ssc": iou_ssc,
            "iou_ssc_mean": float(np.mean(iou_ssc[1:])),
        }
