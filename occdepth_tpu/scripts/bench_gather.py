"""Microbenchmark: per-voxel row gather strategies on TPU.

The FLoSP lift and the OAD frustum resample are row gathers — for each of
N=262k voxels, fetch one (C,)-row of a (R, C) table (reference SFA.py:17-43
and flosp_depth.py:574-577).  Measured round 1: these gathers are ~36 ms of
the 93 ms flagship forward, ~25x off memory-bound speed of light, because
XLA's TPU gather serializes rows.  This benchmark times alternatives at the
exact flagship shapes so the winner backs `ops/flosp_gather.py` /
`ops/grid_sample.py`.

    python -m occdepth_tpu.scripts.bench_gather [--iters 10]
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


def timeit(fn, variants, iters):
    """Honest axon timing: distinct pre-uploaded inputs + scalar fetch."""
    outs = fn(*variants[0])
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs)
    float(jnp.sum(outs).astype(jnp.float32))
    t0 = time.perf_counter()
    res = [fn(*variants[i % len(variants)]) for i in range(iters)]
    for r in res:
        float(jnp.sum(r).astype(jnp.float32))
    return (time.perf_counter() - t0) / iters * 1000


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


@jax.jit
def xla_take(table, idx):
    return jnp.take(table, idx, axis=0)


@jax.jit
def xla_index(table, idx):
    return table[idx]


@functools.partial(jax.jit, static_argnames=("chunk",))
def xla_take_chunked(table, idx, chunk=8):
    """Gather in `chunk` passes over table slabs (masked accumulation):
    tests whether bounded table slices unlock a faster XLA path."""
    R, C = table.shape
    slab = -(-R // chunk)
    out = jnp.zeros((idx.shape[0], C), table.dtype)
    for k in range(chunk):
        lo = k * slab
        sl = jax.lax.dynamic_slice_in_dim(table, lo, min(slab, R - lo), 0)
        local = idx - lo
        hit = (local >= 0) & (local < sl.shape[0])
        safe = jnp.where(hit, local, 0)
        out = out + jnp.where(hit[:, None], jnp.take(sl, safe, axis=0), 0)
    return out


def pallas_gather(table, idx, tile=2048):
    """Pallas: table resident in VMEM, grid over index tiles, vector gather
    in-kernel (Mosaic dynamic-gather lowering)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = table.shape
    T = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        out_ref[:] = jnp.take(table_ref[:], idx_ref[:], axis=0)

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


def pallas_gather_loop(table, idx, tile=1024):
    """Pallas: fori_loop of per-row dynamic slices (latency reference)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C = table.shape
    T = idx.shape[0]

    def kernel(idx_ref, table_ref, out_ref):
        def body(i, _):
            out_ref[pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[i], 1), :]
            return 0

        jax.lax.fori_loop(0, tile, body, 0)

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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    for name, rows, cols in SHAPES:
        variants = make_variants(rows, cols, dtype)
        bytes_out = N * cols * np.dtype(
            np.float32 if dtype == jnp.float32 else np.float16).itemsize
        print(f"\n{name}: table ({rows}, {cols}) {args.dtype}, "
              f"{N} rows gathered ({bytes_out / 1e6:.1f} MB out)")
        for label, fn in [
            ("xla take", xla_take),
            ("xla index", xla_index),
            ("xla chunked8", lambda t, i: xla_take_chunked(t, i, chunk=8)),
        ]:
            try:
                t = timeit(fn, variants, args.iters)
                print(f"  {label:18s} {t:7.2f} ms  "
                      f"({bytes_out / t / 1e6:.1f} GB/s out)")
            except Exception as e:  # noqa: BLE001
                print(f"  {label:18s} FAILED: {str(e)[:120]}")
        vmem_mb = rows * cols * (2 if dtype == jnp.bfloat16 else 4) / 1e6
        if vmem_mb < 14:
            for label, fn in [
                ("pallas vec", jax.jit(pallas_gather)),
                ("pallas loop", jax.jit(pallas_gather_loop)),
            ]:
                try:
                    t = timeit(fn, variants, args.iters)
                    print(f"  {label:18s} {t:7.2f} ms  "
                          f"({bytes_out / t / 1e6:.1f} GB/s out)")
                except Exception as e:  # noqa: BLE001
                    print(f"  {label:18s} FAILED: {str(e)[:120]}")
        else:
            print(f"  (pallas skipped: table {vmem_mb:.1f} MB > VMEM)")


if __name__ == "__main__":
    main()
