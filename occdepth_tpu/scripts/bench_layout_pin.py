"""Explicit-layout experiment: pin full-grid layouts in the 3D decoder.

VERDICT r3 next-#1a: attack the batched-eval layout pathology (and the
train step's full-grid copy traffic) with jax.experimental.layout
constraints instead of compiler-option knobs.  Measures pipelined eval
throughput (bench.py methodology) for the BATCHED single-device path
(cfg.eval_unroll=False) under each cfg.layout_pin mode, vs the shipping
unrolled path as the reference row.

    python -m occdepth_tpu.scripts.bench_layout_pin --batches 2,4 \
        --modes off,xminor,cminor

Train-step timing under a pin is bench_train:
    python -m occdepth_tpu.scripts.bench_train --layout-pin xminor
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.scripts.bench_eval_layout import throughput
from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="2,4")
    ap.add_argument("--modes", default="off,xminor,cminor")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    enable()

    base = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=False, compute_dtype="bfloat16",
    )
    modes = [("unroll", dataclasses.replace(base, eval_unroll=True))]
    for m in args.modes.split(","):
        modes.append((f"batched/pin={m}", dataclasses.replace(
            base, eval_unroll=False, layout_pin=m)))

    results = {}
    for bs in [int(b) for b in args.batches.split(",")]:
        for name, cfg in modes:
            key = f"bs{bs}/{name}"
            t0 = time.perf_counter()
            try:
                fps = throughput(cfg, bs, None, args.iters)
            except Exception as e:
                print(f"{key:28s} SKIP ({str(e).splitlines()[0][:120]})",
                      flush=True)
                continue
            results[key] = round(fps, 2)
            print(f"{key:28s} {fps:6.2f} fps   "
                  f"(item {time.perf_counter() - t0:.0f}s)", flush=True)
    print(json.dumps({"metric": "layout_pin_eval_fps", **results}))


if __name__ == "__main__":
    main()
