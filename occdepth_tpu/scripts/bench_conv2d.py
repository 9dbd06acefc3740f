"""Amortized TPU timing: XLA conv vs shifted-matmul vs Pallas conv.

Shapes are the flagship 2D decoder's hot 3x3 convs (b3 backbone,
feature_2d_oc=32; both stereo views folded into batch).

    python -m occdepth_tpu.scripts.bench_conv2d [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from occdepth_tpu.ops.conv2d_shift import (
    conv3x3_pallas,
    conv3x3_pallas_x3,
    conv3x3_shift,
)
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

SHAPES = [
    # (B, H, W, Ci, Co) — up1 conv0/conv1, up2 conv0/conv1 (b3: f=1536)
    (2, 370, 1220, 99, 48),
    (2, 370, 1220, 48, 48),
    (2, 185, 610, 120, 96),
    (2, 185, 610, 96, 96),
]


def xla_conv(x, w, b):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--block-rows", type=int, default=0)
    args = ap.parse_args()
    enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    K = args.repeats

    rng = jax.random.PRNGKey(0)
    for B, H, W, Ci, Co in SHAPES:
        k1, k2, k3, rng = jax.random.split(rng, 4)
        x = jax.random.normal(k1, (B, H, W, Ci), dtype)
        w = jax.random.normal(k2, (3, 3, Ci, Co), jnp.float32) * 0.05
        b = jax.random.normal(k3, (Co,), jnp.float32)
        br = args.block_rows or (4096 if W > 700 else 8192)
        gf = 2 * B * H * W * 9 * Ci * Co / 1e9
        t_xla = timeit(xla_conv, x, w, b, K=K)
        print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  xla    {t_xla:7.3f} ms"
              f"  [{gf / t_xla:6.1f} TF/s]", flush=True)
        t_shift = timeit(conv3x3_shift, x, w, b, K=K)
        print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  shift  {t_shift:7.3f} ms"
              f"  [{gf / t_shift:6.1f} TF/s]", flush=True)
        try:
            t_pal = timeit(
                functools.partial(conv3x3_pallas, block_rows=br), x, w, b, K=K
            )
            print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  pallas {t_pal:7.3f} ms"
                  f"  [{gf / t_pal:6.1f} TF/s]", flush=True)
        except Exception as e:
            print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  pallas FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)
        try:
            t_x3 = timeit(
                functools.partial(conv3x3_pallas_x3, block_rows=br),
                x, w, b, K=K,
            )
            print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  pal_x3 {t_x3:7.3f} ms"
                  f"  [{gf / t_x3:6.1f} TF/s]", flush=True)
        except Exception as e:
            print(f"({B},{H},{W},{Ci:3d}->{Co:3d})  pal_x3 FAILED: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
