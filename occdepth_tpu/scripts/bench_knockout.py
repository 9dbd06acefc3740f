"""Knockout attribution of the flagship training step's device time.

`bench_bwd` times components in ISOLATION; their sum undershoots the
in-context step (ROADMAP: cross-stage glue/layout copies).  Since the
axon tunnel cannot run the profiler, this measures the marginal
IN-CONTEXT cost of each stage instead: the full train step's amortized
device time for the flagship config and for config knockouts that
remove one stage at a time.  flagship - knockout = that stage's true
in-context cost (fwd + bwd + its share of the glue).

    python -m occdepth_tpu.scripts.bench_knockout [--iters 6]
"""
from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_train_step
from occdepth_tpu.utils.compilation_cache import enable

VARIANTS = [
    ("flagship", {}),
    ("no_oad", {"trans_2d_to_3d": "flosp", "use_stereo_depth_gt": False}),
    ("no_crp", {"context_prior": False, "relation_loss": False}),
    ("no_cascade", {"cascade_cls": False}),
    ("scale_1_only", {"project_1_2": False, "project_1_4": False,
                      "project_1_8": False}),
    ("no_depth_loss", {"use_stereo_depth_gt": False}),
    ("mono", {"multi_view_mode": False, "use_stereo_depth_gt": False}),
    # backward-only knockouts: forward unchanged, SFA table grads cut
    ("sfa_nograd_248", {"sfa_bwd_stop_scales": (2, 4, 8)}),
    ("sfa_nograd_all", {"sfa_bwd_stop_scales": (1, 2, 4, 8)}),
]


def measure(cfg: OccDepthConfig, iters: int) -> float:
    batch = make_synthetic_batch(cfg, batch_size=1, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    train_step = make_train_step(cfg, tx)

    def chain(k_steps):
        @jax.jit
        def fn(st, b):
            def body(_, s):
                s2, *_ = train_step(s, b, jnp.zeros(()))
                return s2
            out = jax.lax.fori_loop(0, k_steps, body, st)
            leaves = jax.tree_util.tree_leaves(out.params)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return fn

    f1, fK = chain(1), chain(iters)
    float(f1(state, batch))
    float(fK(state, batch))

    def run(fn, reps=2):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(state, batch))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (run(fK) - run(f1)) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    args = ap.parse_args()
    enable()
    only = set(args.only.split(",")) if args.only else None

    base = None
    for name, overrides in VARIANTS:
        if only and name not in only and name != "flagship":
            continue
        kwargs = dict(
            dataset="kitti", use_stereo_depth_gt=True,
            compute_dtype=args.dtype,
        )
        kwargs.update(overrides)
        cfg = OccDepthConfig(**kwargs)
        try:
            dt = measure(cfg, args.iters) * 1000
        except Exception as e:
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        if name == "flagship":
            base = dt
            print(f"{name:14s} {dt:7.1f} ms/step", flush=True)
        else:
            marg = f"  (marginal {base - dt:+6.1f} ms)" if base else ""
            print(f"{name:14s} {dt:7.1f} ms/step{marg}", flush=True)


if __name__ == "__main__":
    main()
