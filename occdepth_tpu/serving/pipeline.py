"""Steady-state batched inference pipeline (the serving runtime).

The reference has no serving layer — inference is `generate_output.py`'s
manual loop (occdepth/scripts/generate_output.py:86-134), which uploads
normalized fp32 images and synchronizes per batch.  This pipeline is the
TPU-native deployment shape:

* **uint8 ingestion** — frames cross the host->device link as uint8 HWC
  (4x fewer bytes than fp32); the /255 + ImageNet normalization runs
  on-device inside the jitted graph, fused into the first conv's input.
* **fixed-shape batching** — frames are grouped into a constant batch
  size (ragged tails padded, results of pad rows dropped) so the graph
  compiles once; per-rig calibration tensors are uploaded once and reused
  across every batch.
* **bounded async pipelining** — JAX dispatch is asynchronous: up to
  `max_in_flight` batches are resident (upload of batch i+1 and host
  readout of batch i-1 overlap device compute of batch i), which is what
  amortizes the dispatch/transfer round trip in bench.py's methodology.
* **compact egress** — only the argmax class grid leaves the device
  (uint8, ~2 MB/frame for KITTI) instead of fp32 logits (~160 MB).
"""
from __future__ import annotations

from collections import deque
from typing import Dict, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from occdepth_tpu.models import OccDepthModel


class ServingPipeline:
    """Batched steady-state inference for one camera rig.

    Args:
        cfg: model config (img_shape, views, ... must match the rig).
        variables: {"params", "batch_stats"} pytree (converted or trained).
        calib_batch: batch dict from `scripts.infer.build_batch` (or a
            dataset sample) holding the non-image tensors — projected_pix,
            fov_mask, cam_k, T_velo_2_cam, ida_mats — with any leading
            batch dim; row 0 is broadcast to the serving batch.
        batch_size: frames per dispatch.
        max_in_flight: dispatched-but-unread batches to keep resident.
    """

    def __init__(
        self,
        cfg: OccDepthConfig,
        variables,
        calib_batch: Dict[str, np.ndarray],
        batch_size: int = 8,
        max_in_flight: int = 2,
    ):
        self.cfg = cfg
        self.batch_size = int(batch_size)
        self.max_in_flight = max(1, int(max_in_flight))
        model = OccDepthModel(cfg=cfg)

        B = self.batch_size
        static = {}
        for k, v in calib_batch.items():
            if k == "img" or k.startswith("frustums") or k in (
                "target", "gt_depth", "CP_mega_matrices", "occluded",
                "sample_valid", "frame_id", "sequence",
            ):
                continue
            v = np.asarray(v)
            static[k] = np.broadcast_to(v[:1], (B,) + v.shape[1:]).copy()
        self._static = jax.device_put(static)
        self._variables = jax.device_put(variables)

        mean = jnp.asarray(np.asarray(IMAGENET_MEAN, np.float32))
        std = jnp.asarray(np.asarray(IMAGENET_STD, np.float32))

        def serve(variables, static_parts, imgs_u8):
            img = imgs_u8.astype(jnp.float32) / 255.0
            img = (img - mean) / std
            batch = dict(static_parts)
            batch["img"] = img
            out = model.apply(variables, batch, train=False)
            return jnp.argmax(out["ssc_logit"], axis=-1).astype(jnp.uint8)

        self._serve = jax.jit(serve)

    def warmup(self) -> None:
        """Compile the serving graph (first dispatch is then steady-state)."""
        H, W = self.cfg.img_shape
        V = 2 if self.cfg.multi_view_mode else 1
        z = np.zeros((self.batch_size, V, H, W, 3), np.uint8)
        np.asarray(self._serve(self._variables, self._static, z))

    def run(
        self, frames: Iterable[np.ndarray]
    ) -> Iterator[np.ndarray]:
        """Map frames -> predicted class grids, in order.

        Each frame is a (V, H, W, 3) uint8 array.  Yields one
        (X, Y, Z) uint8 grid per input frame; the tail batch is padded
        internally and its padding rows are dropped.
        """
        B = self.batch_size
        in_flight: deque = deque()  # (device_result, n_valid)

        def drain_one():
            out, n_valid = in_flight.popleft()
            for row in np.asarray(out)[:n_valid]:
                yield row

        buf = []
        for frame in frames:
            buf.append(np.asarray(frame, np.uint8))
            if len(buf) == B:
                while len(in_flight) >= self.max_in_flight:
                    yield from drain_one()
                imgs = jax.device_put(np.stack(buf))
                in_flight.append(
                    (self._serve(self._variables, self._static, imgs), B)
                )
                buf = []
        if buf:
            n_valid = len(buf)
            buf += [buf[0]] * (B - n_valid)
            imgs = jax.device_put(np.stack(buf))
            in_flight.append(
                (self._serve(self._variables, self._static, imgs), n_valid)
            )
        while in_flight:
            yield from drain_one()
