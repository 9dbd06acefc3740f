"""Static HLO roofline profile of the flagship train/eval/forward graph.

The axon dev tunnel cannot serve jax.profiler traces, so this uses
utils/hlo_profile: compile the jitted graph (persistent-cache-friendly),
parse the optimized HLO, and print per-instruction / per-scope roofline
estimates — enough to attribute in-context cost to model stages and to
separate forward from backward (op_name scopes carry `transpose(jvp(...))`
for backward ops).

    python -m occdepth_tpu.scripts.profile_step --what train --group scope
    python -m occdepth_tpu.scripts.profile_step --what forward --top 40
"""
from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.utils.compilation_cache import enable
from occdepth_tpu.utils.hlo_profile import hlo_breakdown, print_breakdown


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="train",
                    choices=("train", "eval", "forward"))
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", default=None, choices=(None, "scope", "dtype"))
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--dtype", default=None,
                    help="override compute dtype (default: the config's; "
                         "bfloat16 for the flagship default)")
    ap.add_argument("--config", default=None,
                    help="profile a shipped YAML config instead of the "
                         "flagship KITTI stereo default")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="a measured device time for this graph (e.g. from "
                         "bench_train); prints derived HBM utilization and "
                         "MFU against the static roofline")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    enable()

    if args.config:
        from occdepth_tpu.config import load_config, parse_overrides

        cfg = load_config(args.config, parse_overrides(args.overrides))
        if args.dtype:
            cfg = dataclasses.replace(cfg, compute_dtype=args.dtype)
    else:
        cfg = OccDepthConfig(
            dataset="kitti",
            use_stereo_depth_gt=(args.what == "train"),
            compute_dtype=args.dtype or "bfloat16",
        )
    batch = make_synthetic_batch(
        cfg, batch_size=args.batch_size, with_labels=(args.what != "forward")
    )

    if args.what == "forward":
        from occdepth_tpu.models import OccDepthModel

        model = OccDepthModel(cfg=cfg)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch, train=False
        )
        fn = lambda v, b: model.apply(v, b, train=False)["ssc_logit"]
        rows = hlo_breakdown(fn, variables, batch)
    else:
        from occdepth_tpu.training.optim import make_optimizer
        from occdepth_tpu.training.step import (
            init_state, make_eval_step, make_train_step,
        )

        tx = make_optimizer(cfg, steps_per_epoch=1000)
        state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
        if args.what == "train":
            step = make_train_step(cfg, tx)
            rows = hlo_breakdown(step, state, batch, jnp.zeros(()))
        else:
            step = make_eval_step(cfg)
            rows = hlo_breakdown(
                step, state.params, state.batch_stats, batch
            )
    print_breakdown(rows, top=args.top, group=args.group, depth=args.depth)
    if args.measured_ms:
        from occdepth_tpu.utils.hlo_profile import roofline_summary

        summ = roofline_summary(rows, args.measured_ms / 1e3)
        print(f"at measured {args.measured_ms:.1f} ms: "
              f"hbm_util~{summ['hbm_util']} mfu~{summ['mfu']}")


if __name__ == "__main__":
    main()
