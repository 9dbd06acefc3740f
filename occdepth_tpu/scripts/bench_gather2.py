"""Which gather construct is slow? (follow-up to bench_gather/bench_sfa)

Raw `jnp.take(table(R,C), idx(N,))` measured fast (0.03-0.26 ms) but the
same gather inside the SFA lift costs ~2.7 ms — this isolates the
candidate culprits: the (N, P=1) pattern axis, the vmap over views, the
sentinel-concat, and the in-graph index arithmetic.

    python -m occdepth_tpu.scripts.bench_gather2
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

N = 128 * 128 * 16
H, W, C = 370, 1220, 32


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    K = args.repeats
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rs = np.random.RandomState(0)

    R = H * W
    table = jnp.asarray(rs.randn(R + 1, C).astype(np.float32), dtype)
    table2 = jnp.asarray(rs.randn(2, R + 1, C).astype(np.float32), dtype)
    x2d2 = jnp.asarray(rs.randn(2, H, W, C).astype(np.float32), dtype)
    idx1 = jnp.asarray(rs.randint(0, R, size=(N,)).astype(np.int32))
    idx1p = idx1[:, None]  # (N, 1)
    idx2 = jnp.asarray(rs.randint(0, R, size=(2, N)).astype(np.int32))
    idx2p = idx2[..., None]  # (2, N, 1)
    pix = jnp.asarray(
        np.stack([rs.randint(0, W, (2, N, 1)), rs.randint(0, H, (2, N, 1))],
                 -1).astype(np.int32))
    fovm = jnp.asarray(rs.rand(2, N, 1) < 0.45)

    tableL = jnp.asarray(rs.randn(2 * R + 1, C).astype(np.float32), dtype)
    idx2N_small = jnp.asarray(rs.randint(0, R, size=(2 * N,)).astype(np.int32))
    idx2N_large = jnp.asarray(
        rs.randint(0, 2 * R, size=(2 * N,)).astype(np.int32))
    idxN_large = jnp.asarray(
        rs.randint(0, 2 * R, size=(N,)).astype(np.int32))

    from occdepth_tpu.ops.flosp_gather import flosp_gather_flat
    x2d_bv = x2d2[None]  # (1, 2, H, W, C)

    cases = [
        ("take (N,) idx", lambda t: jnp.take(t, idx1, axis=0), table),
        ("take 2N from R table", lambda t: jnp.take(t, idx2N_small, axis=0),
         table),
        ("take N from 2R table", lambda t: jnp.take(t, idxN_large, axis=0),
         tableL),
        ("take 2N from 2R table", lambda t: jnp.take(t, idx2N_large, axis=0),
         tableL),
        ("flat gather full (1,2,...)",
         lambda x: flosp_gather_flat(x, pix[None], fovm[None])[0], x2d_bv),
        ("take (N,1) idx", lambda t: jnp.take(t, idx1p, axis=0), table),
        ("take (N,) -> reshape(N,1,C)",
         lambda t: jnp.take(t, idx1, axis=0).reshape(N, 1, C), table),
        ("vmap take (2,N)",
         lambda t: jax.vmap(lambda tt, ii: jnp.take(tt, ii, axis=0))(
             t, idx2), table2),
        ("vmap take (2,N,1)",
         lambda t: jax.vmap(lambda tt, ii: jnp.take(tt, ii, axis=0))(
             t, idx2p), table2),
        ("reshape+concat+take (N,)",
         lambda x: jnp.take(
             jnp.concatenate(
                 [x.reshape(H * W, C), jnp.zeros((1, C), x.dtype)], 0),
             idx1, axis=0), x2d2[0]),
        ("full _lift path (2 views)",
         lambda x: _lift(x, pix, fovm), x2d2),
    ]

    def _lift(x2d, pixv, fovv):
        from occdepth_tpu.ops.flosp_gather import flosp_gather_flat
        fe, va = flosp_gather_flat(x2d[None], pixv[None], fovv[None])
        return (fe * va[..., None]).sum(axis=1)[0]

    for label, fn, arg in cases:
        t = timeit(fn, arg, K=K)
        print(f"  {label:32s} {t:7.2f} ms")


if __name__ == "__main__":
    main()
