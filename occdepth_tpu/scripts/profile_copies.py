"""Break down the scope-less (compiler-inserted) HLO cost of the train step.

The scope-grouped profile (profile_step --group scope) shows more than half
the flagship train-step roofline estimate carries no op_name metadata —
layout copies, rematerialized fusions, host transfers the compiler created.
This tool groups exactly those instructions by (op, output type) so the
layout-motion hot spots are identifiable by shape.

    python -m occdepth_tpu.scripts.profile_copies [--top 25]
"""
from __future__ import annotations

import argparse
import collections

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.utils.compilation_cache import enable
from occdepth_tpu.utils.hlo_profile import hlo_breakdown


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--scoped", action="store_true",
                    help="also include scoped instructions in the grouping")
    args = ap.parse_args()
    enable()

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=True, compute_dtype="bfloat16",
    )
    batch = make_synthetic_batch(cfg, batch_size=1, with_labels=True)

    from occdepth_tpu.training.optim import make_optimizer
    from occdepth_tpu.training.step import init_state, make_train_step

    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(cfg, tx)
    rows = hlo_breakdown(step, state, batch, jnp.zeros(()))

    groups = collections.defaultdict(lambda: [0.0, 0, 0])
    total_anon_t = 0.0
    for r in rows:
        if r.scope and not args.scoped:
            continue
        total_anon_t += r.t_us
        key = (r.op, r.out_type[:70])
        g = groups[key]
        g[0] += r.t_us
        g[1] += r.bytes
        g[2] += 1
    print(f"scope-less instructions: est {total_anon_t/1e3:.2f} ms total")
    ranked = sorted(groups.items(), key=lambda kv: -kv[1][0])
    for (op, otype), (t, b, n) in ranked[: args.top]:
        print(f"{t/1e3:8.3f} ms  {b/1e9:7.2f} GB  n={n:5d}  {op:14s} {otype}")


if __name__ == "__main__":
    main()
