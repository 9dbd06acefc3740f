"""Amortized TPU timing: full-grid conv3d — current decomposition vs z-fold.

The static HLO profile (scripts/profile_step.py) attributes the largest
share of the train step to layout motion on full-grid (1,256,256,32,C)
tensors (C on the 128-lane axis pads tiles 8x).  This bench measures, at
the exact flagship full-grid and l1 shapes, whether the lane-folded
formulations (ops/zfold_conv.py) beat the current conv3d decomposition
once chains of convs + elementwise ops are involved:

    A  conv3d_decomposed (status quo; X folded into batch, C on lanes)
    B  zfold dense-banded (Z*C on lanes, one 2D conv, ~Z/kz extra flops)
    C  zfold grouped 3-tap (Z*C on lanes, feature_group_count=Z)

    python -m occdepth_tpu.scripts.bench_zfold [--repeats 6]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from occdepth_tpu.ops.conv3d_fast import conv3d_decomposed
from occdepth_tpu.ops.zfold_conv import (
    band_weights,
    zfold_conv3d,
    zfold_conv3d_folded,
    zfold_conv3d_grouped,
)
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

PAD3 = ((1, 1), (1, 1), (1, 1))
PAD2 = ((1, 1), (1, 1))


def conv_a(x, k):
    return conv3d_decomposed(x, k.astype(x.dtype), (1, 1, 1), PAD3, (1, 1, 1))


def conv_b(x, k):
    return zfold_conv3d(x, k.astype(x.dtype), PAD2)


def conv_c(x, k):
    return zfold_conv3d_grouped(x, k.astype(x.dtype), PAD2)


def chain_a(x, ks):
    h = x
    for k in ks:
        h = jax.nn.relu(conv_a(h, k))
    return h


def chain_b(x, ks):
    B, X, Y, Z, C = x.shape
    h = x.reshape(B, X, Y, Z * C)
    for k in ks:
        h = jax.nn.relu(zfold_conv3d_folded(h, k.astype(h.dtype), Z, PAD2))
    return h.reshape(B, X, Y, Z, ks[-1].shape[-1])


def grad_of(fn):
    def loss(x, ks):
        o = fn(x, ks)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    return jax.grad(loss, argnums=(0, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    K = args.repeats
    rng = jax.random.PRNGKey(0)

    # exactness sanity (small shape, fp32)
    kx, kk = jax.random.split(rng)
    xs = jax.random.normal(kx, (1, 8, 8, 8, 4), jnp.float32)
    ws = jax.random.normal(kk, (3, 3, 3, 4, 4), jnp.float32) * 0.1
    ya = np.asarray(conv_a(xs, ws))
    yb = np.asarray(conv_b(xs, ws))
    yc = np.asarray(conv_c(xs, ws))
    print("exactness  B vs A:", np.abs(yb - ya).max(),
          " C vs A:", np.abs(yc - ya).max(), flush=True)

    for (B, X, Y, Z, Ci, Co, tag) in [
        (1, 256, 256, 32, 16, 16, "full-grid 16->16"),
        (1, 256, 256, 32, 18, 20, "full-grid classes 18->20"),
        (1, 128, 128, 16, 32, 32, "l1 32->32"),
    ]:
        k1, k2, rng = jax.random.split(rng, 3)
        x = jax.random.normal(k1, (B, X, Y, Z, Ci), dtype)
        w = jax.random.normal(k2, (3, 3, 3, Ci, Co), jnp.float32) * 0.05
        gf_real = 2 * B * X * Y * Z * 27 * Ci * Co / 1e9
        print(f"\n[{tag}] ({B},{X},{Y},{Z},{Ci}->{Co})  real {gf_real:.1f} GF",
              flush=True)
        for name, fn in [("A decomp", conv_a), ("B zfold ", conv_b),
                         ("C group ", conv_c)]:
            try:
                t = timeit(fn, x, w, K=K)
                print(f"  fwd {name}: {t:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  fwd {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    # chain of 3 convs + relu (head-like), fwd+bwd
    for (B, X, Y, Z, C, tag) in [
        (1, 256, 256, 32, 16, "full-grid chain3"),
    ]:
        k1, k2, rng = jax.random.split(rng, 3)
        x = jax.random.normal(k1, (B, X, Y, Z, C), dtype)
        ks = tuple(
            jax.random.normal(jax.random.fold_in(k2, i),
                              (3, 3, 3, C, C), jnp.float32) * 0.05
            for i in range(3)
        )
        print(f"\n[{tag}] ({B},{X},{Y},{Z},{C})", flush=True)
        for name, fn in [("A decomp", chain_a), ("B zfold ", chain_b)]:
            try:
                t = timeit(fn, x, ks, K=K)
                print(f"  fwd      {name}: {t:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  fwd      {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        for name, fn in [("A decomp", chain_a), ("B zfold ", chain_b)]:
            try:
                t = timeit(grad_of(fn), x, ks, K=K)
                print(f"  fwd+bwd  {name}: {t:7.3f} ms", flush=True)
            except Exception as e:
                print(f"  fwd+bwd  {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
