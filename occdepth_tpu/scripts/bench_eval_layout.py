"""Batched-eval layout experiment: unrolled vs batched vs batched+flags.

Finding #7 (docs/DESIGN.md): single-device eval at batch >= 2 hits an XLA
layout pathology on the full-grid 3D tensors (12.6 -> 149 ms for the 3D
UNet at batch 2), worked around by per-sample unrolls (cfg.eval_unroll).
This bench asks whether a compiler-option set can fix the batched path at
the root, which would let the unroll scar tissue collapse to one code
path: it measures pipelined eval throughput (bench.py methodology —
distinct pre-uploaded inputs, scalar fetch per iteration) for

  * unroll      — the shipping path (eval_unroll=True),
  * batched     — one batched apply (eval_unroll=False),
  * batched+<set> — batched under each --sets compiler-option set
    (names from bench_xla_flags.OPTION_SETS).

    python -m occdepth_tpu.scripts.bench_eval_layout --batches 1,2,4,8 \
        --sets vmem64m
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.models.occdepth import eval_apply
from occdepth_tpu.scripts.bench_xla_flags import OPTION_SETS
from occdepth_tpu.utils.compilation_cache import enable


def throughput(cfg, batch_size, opts=None, n_iters=8):
    model = OccDepthModel(cfg=cfg)
    batch = make_synthetic_batch(cfg, batch_size=batch_size,
                                 with_labels=False)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    fn = jax.jit(
        lambda v, b: jnp.sum(
            eval_apply(model, v, b)["ssc_logit"].astype(jnp.float32)
        ),
        compiler_options=opts or None,
    )
    variables = jax.device_put(variables)
    rs = np.random.RandomState(0)
    variants = []
    for _ in range(n_iters):
        b = dict(batch)
        b["img"] = batch["img"] + rs.randn(*batch["img"].shape).astype(
            np.float32
        ) * 0.01
        variants.append(jax.device_put(b))

    float(fn(variables, variants[0]))  # compile + warm
    t0 = time.perf_counter()
    outs = [fn(variables, variants[i]) for i in range(n_iters)]
    for o in outs:
        float(o)
    dt = time.perf_counter() - t0
    return n_iters * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4")
    ap.add_argument("--sets", default="",
                    help="comma-separated bench_xla_flags option-set names "
                         "to try on the batched path")
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    enable()

    base = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=False, compute_dtype="bfloat16",
    )
    modes = [("unroll", dataclasses.replace(base, eval_unroll=True), None),
             ("batched", dataclasses.replace(base, eval_unroll=False), None)]
    for name in filter(None, args.sets.split(",")):
        modes.append((f"batched+{name}",
                      dataclasses.replace(base, eval_unroll=False),
                      OPTION_SETS[name]))

    results = {}
    for bs in [int(b) for b in args.batches.split(",")]:
        for mode, cfg, opts in modes:
            key = f"bs{bs}/{mode}"
            t_start = time.perf_counter()
            try:
                fps = throughput(cfg, bs, opts, args.iters)
            except Exception as e:
                print(f"{key:24s} SKIP ({str(e).splitlines()[0][:120]})",
                      flush=True)
                continue
            results[key] = round(fps, 2)
            print(f"{key:24s} {fps:6.2f} fps"
                  f"   (item took {time.perf_counter() - t_start:.0f}s)",
                  flush=True)
    print(json.dumps({"metric": "eval_layout_fps", **results}))


if __name__ == "__main__":
    main()
