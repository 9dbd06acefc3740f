"""Serving-pipeline throughput: uint8 frames in -> class grids out.

Unlike bench.py (pre-uploaded fp32 inputs; measures device throughput),
this measures the full serving loop: per-batch uint8 host->device upload
(4x smaller than fp32), on-device normalization + forward + argmax, and
uint8 grid readback — i.e. what a deployment actually sustains through
the host link.  Frames are distinct (the axon proxy replays bit-identical
executions) and results are consumed on host.

    python -m occdepth_tpu.scripts.bench_serving [--batch 8] [--frames 32]
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--in-flight", type=int, default=3)
    args = ap.parse_args()
    enable()

    from occdepth_tpu.config import OccDepthConfig
    from occdepth_tpu.data.batch import make_synthetic_batch
    from occdepth_tpu.models import OccDepthModel
    from occdepth_tpu.serving import ServingPipeline

    cfg = OccDepthConfig(
        dataset="kitti",
        use_stereo_depth_gt=False,
        compute_dtype="bfloat16",
    )
    model = OccDepthModel(cfg=cfg)
    template = make_synthetic_batch(cfg, batch_size=1, with_labels=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), template, train=False
    )

    H, W = cfg.img_shape
    V = 2 if cfg.multi_view_mode else 1
    rs = np.random.RandomState(0)
    frames = [
        rs.randint(0, 256, size=(V, H, W, 3)).astype(np.uint8)
        for _ in range(args.frames)
    ]

    pipe = ServingPipeline(
        cfg, variables, template,
        batch_size=args.batch, max_in_flight=args.in_flight,
    )
    t0 = time.perf_counter()
    pipe.warmup()
    print(f"warmup (compile): {time.perf_counter() - t0:.1f}s")

    # one untimed pass to settle allocator/layout
    checksum = sum(int(p[0, 0, 0]) for p in pipe.run(frames[: args.batch]))

    t0 = time.perf_counter()
    n = 0
    for p in pipe.run(frames):
        checksum += int(p[0, 0, 0])
        n += 1
    dt = time.perf_counter() - t0
    fps = n / dt
    print(f"serving: {n} frames in {dt:.3f}s -> {fps:.2f} fps "
          f"(batch={args.batch}, in_flight={args.in_flight}, "
          f"checksum={checksum})")


if __name__ == "__main__":
    main()
