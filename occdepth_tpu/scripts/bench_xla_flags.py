"""XLA TPU compiler-option sweep over the flagship train step.

The train step is ~93% HBM-bound with the cost concentrated in the 2D
UNet backward, and equivalent graphs swing +-40 ms from XLA scheduling
choices alone (docs/DESIGN.md "Training-step performance").  Since the
axon tunnel cannot run jax.profiler, the remaining sanctioned lever is
the compiler itself: this sweep re-compiles the SAME chained-K train
step under named `compiler_options` sets (scoped-VMEM budget,
latency-hiding scheduler toggles, fusion knobs) and reports device
ms/step for each, using bench_train's (tK - t1)/(K - 1) protocol so the
~25 s/dispatch axon state-transfer overhead cancels.

Options are passed per-compile via ``jax.jit(compiler_options=...)`` so
they survive the remote-compile proxy (env XLA_FLAGS may not).  Unknown
or rejected flags are reported as SKIP rather than failing the sweep.

    python -m occdepth_tpu.scripts.bench_xla_flags [--iters 6] [--sets A,B]
"""
from __future__ import annotations

import argparse
import json
import time
import traceback

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.parallel import make_mesh, shard_batch
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import init_state, make_train_step
from occdepth_tpu.utils.compilation_cache import enable

# Named option sets.  Values are strings (the PJRT compile-options env
# schema); booleans must be "true"/"false".
OPTION_SETS = {
    # more VMEM scratch per fusion: bigger fusions, fewer HBM round-trips
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # scheduler variants (the +-40 ms swing lives here)
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "lhs_rerun2": {"xla_latency_hiding_scheduler_rerun": "2"},
    # fusion aggressiveness
    "no_rwb": {"xla_tpu_rwb_fusion": "false"},
    "aggr_loop_fusion": {"xla_tpu_enable_aggressive_loop_fusion": "true"},
    # memory-space-assignment prefetch tuning (the "85 GB" async copies)
    "msa_bw_2x": {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"},
    "msa_bw_half": {"xla_tpu_async_copy_bandwidth_scaling_factor": "0.5"},
    "retry_oom": {"xla_tpu_memory_limit_slack_bytes": "1073741824"},
    "combo_vmem_lhs": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_latency_hiding_scheduler_rerun": "2",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--sets", default="",
                    help="comma-separated subset of option-set names")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    enable()

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=True, compute_dtype="bfloat16",
    )
    batch = make_synthetic_batch(cfg, batch_size=args.batch, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    mesh = make_mesh(jax.devices(), ("data",))
    sharded = shard_batch(batch, mesh)
    train_step = make_train_step(cfg, tx)

    K = args.iters

    def chain_fn(k_steps):
        def fn(st, b):
            def body(_, s):
                s2, *_ = train_step(s, b, jnp.zeros(()))
                return s2
            out = jax.lax.fori_loop(0, k_steps, body, st)
            leaves = jax.tree_util.tree_leaves(out.params)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
        return fn

    def measure(opts):
        f1 = jax.jit(chain_fn(1), compiler_options=opts or None)
        fK = jax.jit(chain_fn(K), compiler_options=opts or None)
        float(f1(state, sharded))  # compile+warm
        float(fK(state, sharded))

        def run(fn):
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(fn(state, sharded))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t1, tK = run(f1), run(fK)
        return (tK - t1) / (K - 1)

    names = ["baseline"] + (
        args.sets.split(",") if args.sets else list(OPTION_SETS)
    )
    results = {}
    for name in names:
        opts = {} if name == "baseline" else OPTION_SETS[name]
        t_start = time.perf_counter()
        try:
            dt = measure(opts)
        except Exception as e:  # unknown flag / compile rejection
            msg = str(e).splitlines()[0][:160]
            print(f"{name:18s} SKIP ({msg})", flush=True)
            if "DEADLINE" in msg or "UNAVAILABLE" in msg:
                traceback.print_exc()
            continue
        results[name] = round(dt * 1000, 1)
        print(
            f"{name:18s} {dt * 1000:7.1f} ms/step"
            f"   (sweep item took {time.perf_counter() - t_start:.0f}s)",
            flush=True,
        )
    print(json.dumps({"metric": "xla_flag_sweep_train_step_ms", **results}))


if __name__ == "__main__":
    main()
