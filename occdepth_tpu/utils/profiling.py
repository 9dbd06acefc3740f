"""Profiling / tracing utilities.

Exceeds the reference's ad-hoc instrumentation (thop FLOPs in the OccDepth
__main__, OccDepth.py:674-682; cuda max-memory prints in eval.py:60-85):

  * `trace(logdir)` — context manager around jax.profiler for TensorBoard-
    viewable device traces.
  * `cost_analysis(fn, *args)` — XLA-reported FLOPs/bytes for a jitted fn
    (the thop equivalent, but from the compiler itself).
  * `param_count(params)` — total trainable parameters.
  * `device_memory_stats()` — per-device peak/in-use bytes.
"""
from __future__ import annotations

import contextlib
from typing import Any, Dict

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """Compile fn and return XLA's cost analysis (flops, bytes accessed)."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns a per-device list
        costs = costs[0]
    return {k: float(v) for k, v in costs.items() if np.isscalar(v)}


def param_count(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    out = {}
    for dev in jax.local_devices():
        try:
            out[str(dev)] = dev.memory_stats() or {}
        except Exception:
            out[str(dev)] = {}
    return out
