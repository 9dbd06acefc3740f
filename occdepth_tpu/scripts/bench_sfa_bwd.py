"""SFA gather BACKWARD cost at flagship shapes, and scatter alternatives.

bench_knockout attributes +44 ms of in-context train-step time to the
scale-2/4/8 SFA projections while the isolated SFA fwd+bwd measured only
~11 ms (bench_bwd) — suspicion: the backward of `jnp.take` (a scatter-add
of N=262k cotangent rows into the per-scale 2D feature tables) behaves
differently in context.  This bench times, per scale:

  * fwd      — the gather alone
  * vjp      — d/dtable of sum(take(table, idx) * cot): XLA scatter-add
  * vjp-sort — same but with ascending (host-pre-sorted) indices
  * cumsum   — the sort-free backward: cot rows permuted into index order
               (a gather), fp32 cumsum over rows, dtable = S[end]-S[start]
               (another gather) — no scatter anywhere

    python -m occdepth_tpu.scripts.bench_sfa_bwd [--repeats 8]
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

    for s in (1, 2, 4, 8):
        h, w = (H + s - 1) // s, (W + s - 1) // s
        R = h * w
        idx_np = rs.randint(0, R, size=(N,)).astype(np.int32)
        table = jnp.asarray(rs.randn(R + 1, C).astype(np.float32), dtype)
        cot = jnp.asarray(rs.randn(N, C).astype(np.float32), dtype)
        idx = jnp.asarray(idx_np)

        idx_sorted = jnp.asarray(np.sort(idx_np))
        perm = np.argsort(idx_np, kind="stable").astype(np.int32)
        # row-start offsets of each table row inside the sorted cot array
        starts_np = np.searchsorted(idx_np[perm], np.arange(R + 1)).astype(
            np.int32
        )
        permj = jnp.asarray(perm)
        starts = jnp.asarray(starts_np)  # (R+1,) ; ends = starts[1:]

        def fwd(t, i):
            return jnp.take(t, i, axis=0)

        def scatter_fn(c, i):
            # exactly what the vjp of `take` emits (cot is the first arg so
            # the per-repeat perturbation lands on the scatter operand)
            return jnp.zeros((R + 1, C), c.dtype).at[i].add(c)

        def cumsum_bwd(c, p, st):
            cs = jnp.take(c, p, axis=0).astype(jnp.float32)
            S = jnp.concatenate(
                [jnp.zeros((1, C), jnp.float32), jnp.cumsum(cs, axis=0)], 0
            )
            lo = jnp.take(S, st[:-1], axis=0)
            hi = jnp.take(S, st[1:], axis=0)
            return (hi - lo).astype(c.dtype)

        t_fwd = timeit(fwd, table, idx, K=K)
        t_vjp = timeit(scatter_fn, cot, idx, K=K)
        t_vjps = timeit(scatter_fn, cot, idx_sorted, K=K)
        t_cum = timeit(cumsum_bwd, cot, permj, starts, K=K)
        print(
            f"scale {s}: table ({R},{C})  fwd {t_fwd:7.2f} ms  "
            f"vjp {t_vjp:7.2f} ms  vjp-sorted {t_vjps:7.2f} ms  "
            f"cumsum-bwd {t_cum:7.2f} ms",
            flush=True,
        )

    # ---- the cosine fusion and the whole sfa_lift, fwd and fwd+bwd ----
    from occdepth_tpu.models.sfa import sfa_lift
    from occdepth_tpu.ops.flosp_gather import multiview_cosine_fuse

    feats = jnp.asarray(rs.randn(2, N, C).astype(np.float32))
    valid = jnp.asarray((rs.rand(2, N) < 0.45).astype(np.float32))

    def fuse_fwd(f, v):
        return multiview_cosine_fuse(f, v)

    def fuse_bwd(f, v):
        return jax.grad(lambda ff: jnp.sum(multiview_cosine_fuse(ff, v)))(f)

    print(f"fuse fwd     {timeit(fuse_fwd, feats, valid, K=K):7.2f} ms",
          flush=True)
    print(f"fuse fwd+bwd {timeit(fuse_bwd, feats, valid, K=K):7.2f} ms",
          flush=True)

    x_rgb = {
        f"1_{s}": jnp.asarray(
            rs.randn(1, 2, (H + s - 1) // s, (W + s - 1) // s, C).astype(
                np.float32
            ),
            dtype,
        )
        for s in (1, 2, 4, 8)
    }
    pixf = jnp.asarray(
        np.stack(
            [rs.randint(0, W, (1, 2, N, 1)), rs.randint(0, H, (1, 2, N, 1))],
            -1,
        ).astype(np.int32)
    )
    fovm = jnp.asarray(rs.rand(1, 2, N, 1) < 0.45)
    dims = (128, 128, 16)

    for scales in ((1,), (1, 2, 4, 8)):
        def lift(x):
            return sfa_lift(x, pixf, fovm, scales, dims, "kitti")

        def lift_bwd(x):
            return jax.grad(
                lambda xx: jnp.sum(lift(xx).astype(jnp.float32))
            )(x)

        print(
            f"sfa_lift {scales}: fwd {timeit(lift, x_rgb, K=K):7.2f} ms  "
            f"fwd+bwd {timeit(lift_bwd, x_rgb, K=K):7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
