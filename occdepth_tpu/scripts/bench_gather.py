"""Microbenchmark: per-voxel row gather strategies on TPU.

The FLoSP lift and the OAD frustum resample are row gathers — for each of
N=262k voxels, fetch one (C,)-row of a (R, C) table (reference SFA.py:17-43
and flosp_depth.py:574-577).  Measured round 1: these gathers are ~36 ms of
the 93 ms flagship forward, far off memory-bound speed of light, because
XLA's TPU gather serializes rows.  This benchmark times alternatives at the
exact flagship shapes so the winner backs `ops/flosp_gather.py` /
`ops/grid_sample.py`.

Through the axon tunnel a single dispatch costs ~30-40 ms wall regardless
of device time, so each timed call runs the gather K times inside one jit
(index vector rotated per repeat so executions are distinct) and the
per-gather time is (t_K - t_0) / K between two K values — pure device time,
dispatch overhead cancelled.

    python -m occdepth_tpu.scripts.bench_gather [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.utils.compilation_cache import enable

N = 128 * 128 * 16  # flagship voxel count (project_scale=2)

# (name, table_rows, table_cols): SFA tables are (h*w+1, C=32) at 4 scales;
# OAD is (47*153, D=104)
SHAPES = [
    ("sfa_1_8", 47 * 153 + 1, 32),
    ("sfa_1_4", 93 * 305 + 1, 32),
    ("sfa_1_2", 185 * 610 + 1, 32),
    ("sfa_1_1", 370 * 1220 + 1, 32),
    ("oad_row", 47 * 153, 104),
]


def repeat_op(op, K):
    """Run `op(table, idx)` K times inside one jit, rotating idx each time
    so no execution is a replay, and reduce to one scalar."""

    @jax.jit
    def fn(table, idx):
        R = table.shape[0]

        def body(k, acc):
            rot = (idx + k) % R
            return acc + jnp.sum(op(table, rot).astype(jnp.float32))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    return fn


def timeit_amortized(op, variants, K=16, reps=4):
    """Per-gather device ms via two-point amortization."""
    f1 = repeat_op(op, 1)
    fK = repeat_op(op, K)
    float(f1(*variants[0]))
    float(fK(*variants[0]))

    def run(fn):
        t0 = time.perf_counter()
        outs = [fn(*variants[i % len(variants)]) for i in range(reps)]
        for o in outs:
            float(o)
        return (time.perf_counter() - t0) / reps

    t1 = run(f1)
    tK = run(fK)
    return (tK - t1) / (K - 1) * 1000


def make_variants(rows, cols, dtype, n_var=4, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for i in range(n_var):
        table = rs.randn(rows, cols).astype(np.float32) * 0.1
        idx = rs.randint(0, rows, size=(N,)).astype(np.int32)
        out.append((
            jax.device_put(jnp.asarray(table, dtype)),
            jax.device_put(jnp.asarray(idx)),
        ))
    return out


def xla_take(table, idx):
    return jnp.take(table, idx, axis=0)


def xla_onehot_tiled(table, idx, tile=8192):
    """Gather as one-hot matmul over table tiles (MXU instead of gather)."""
    R, C = table.shape
    Nv = idx.shape[0]
    idxr = idx.reshape(-1, tile)

    def per_chunk(ic):
        oh = jax.nn.one_hot(ic, R, dtype=table.dtype)  # (tile, R)
        return jnp.dot(oh, table, preferred_element_type=jnp.float32)

    out = jax.lax.map(per_chunk, idxr)
    return out.reshape(Nv, C).astype(table.dtype)


def pallas_gather(table, idx, tile=4096):
    """Pallas: table resident in VMEM, grid over index tiles, lane-wise
    dynamic gather (take_along_axis) in-kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = table.shape
    T = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        ids = jnp.broadcast_to(idx_ref[:][:, None], (tile, C))
        out_ref[:] = jnp.take_along_axis(table_ref[:], ids, axis=0)

    return pl.pallas_call(
        kernel,
        grid=(T // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, C), table.dtype),
    )(idx, table)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--repeats", type=int, default=16)
    args = ap.parse_args()
    enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for name, rows, cols in SHAPES:
        variants = make_variants(rows, cols, dtype)
        bytes_out = N * cols * (2 if dtype == jnp.bfloat16 else 4)
        print(f"\n{name}: table ({rows}, {cols}) {args.dtype}, "
              f"{N} rows gathered ({bytes_out / 1e6:.1f} MB out)")
        cands = [("xla take", xla_take)]
        if rows <= 30000:
            cands.append(("onehot mm", xla_onehot_tiled))
        vmem_mb = rows * cols * (2 if dtype == jnp.bfloat16 else 4) / 1e6
        if vmem_mb < 12:
            cands.append(
                ("pallas vec",
                 functools.partial(pallas_gather))
            )
        for label, fn in cands:
            try:
                t = timeit_amortized(fn, variants, K=args.repeats)
                print(f"  {label:18s} {t:7.3f} ms/gather  "
                      f"({bytes_out / t / 1e6:.1f} GB/s out)")
            except Exception as e:  # noqa: BLE001
                print(f"  {label:18s} FAILED: {str(e)[:140]}")


if __name__ == "__main__":
    main()
