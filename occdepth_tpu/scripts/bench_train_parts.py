"""Amortized DEVICE-time breakdown of the flagship training step.

Measures, with the same chained-repeats methodology as
bench_components2.py (dispatch RTT cancels in (t_K - t_1) / (K - 1)):

  1. forward, train mode (BN batch stats mutable)
  2. forward + all seven losses
  3. value_and_grad of (2)  -> backward cost = (3) - (2)
  4. the full train step (3 + AdamW + clip + confusion update)

    python -m occdepth_tpu.scripts.bench_train_parts [--repeats 6]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from occdepth_tpu.config import OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.training.optim import make_optimizer
from occdepth_tpu.training.step import (
    compute_losses,
    create_model,
    init_state,
    make_train_step,
)
from occdepth_tpu.utils.compilation_cache import enable


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    K = args.repeats

    cfg = OccDepthConfig(
        dataset="kitti", use_stereo_depth_gt=True, compute_dtype=args.dtype,
    )
    batch = make_synthetic_batch(cfg, batch_size=1, seed=0)
    tx = make_optimizer(cfg, steps_per_epoch=1000)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, tx)
    model = create_model(cfg)
    progress = jnp.zeros(())

    def fwd(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b, train=True, mutable=["batch_stats"],
        )
        return out["ssc_logit"]

    def fwd_losses(params, b):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            b, train=True, mutable=["batch_stats"],
        )
        loss, _ = compute_losses(cfg, out, b, progress)
        return loss

    def fwd_bwd(params, b):
        return jax.grad(fwd_losses)(params, b)

    step_fn = make_train_step(cfg, tx)

    def full(params, b):
        st = state.replace(params=params)
        new_state, logs, completion, conf = step_fn(st, b, progress)
        # consume the updated params + confusion so nothing is DCE'd
        leaves = jax.tree_util.tree_leaves(new_state.params)
        return (
            sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)
            + conf.astype(jnp.float32).sum() + logs["loss"]
        )

    t_f = timeit(fwd, state.params, batch, K=K)
    print(f"forward (train mode):     {t_f:7.1f} ms")
    t_fl = timeit(fwd_losses, state.params, batch, K=K)
    print(f"forward + losses:         {t_fl:7.1f} ms  (losses ~{t_fl - t_f:.1f})")
    t_fb = timeit(fwd_bwd, state.params, batch, K=K)
    print(f"forward + losses + grad:  {t_fb:7.1f} ms  (backward ~{t_fb - t_fl:.1f})")
    t_full = timeit(full, state.params, batch, K=K)
    print(f"full train step:          {t_full:7.1f} ms  (opt+conf ~{t_full - t_fb:.1f})")


if __name__ == "__main__":
    main()
