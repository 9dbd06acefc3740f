"""Depthwise-conv gradient cost on TPU: fwd vs dx vs dw, per encoder shape.

docs/DESIGN.md (round 2) measured XLA's backward for feature_group_count=C
convs at ~10x the forward (0.5 ms fwd / ~4.7 ms bwd for a 3x3 dw conv at
(2,185,610,144)) and bounded the whole 2D-encoder backward at ~53 ms of the
~197 ms train step.  This bench decomposes that: for every depthwise conv
shape in the tf_efficientnet_b3_ns encoder at the flagship 370x1220 input
(per-view batch 1, reference backbone list occdepth/models/unet2d.py:238),
it times with the amortized chained-K protocol (bench_components2):

  * fwd      — the conv itself,
  * dx       — grad wrt the input only,
  * dw       — grad wrt the filter only (XLA's pathological case),
  * dw_pallas— the fused one-pass Pallas filter-gradient kernel
               (ops/dw_conv.py), when eligible.

    python -m occdepth_tpu.scripts.bench_dwconv [--dtype bfloat16]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

# (name, H, W, C, kernel, stride) — every depthwise conv of the b3 encoder
# at 370x1220 (H, W are the conv INPUT dims; C = channels = groups)
B3_DW_SHAPES = [
    ("s0b0 k3 s1", 185, 610, 40, 3, 1),
    ("s0b1 k3 s1", 185, 610, 24, 3, 1),
    ("s1b0 k3 s2", 185, 610, 144, 3, 2),
    ("s1b1 k3 s1", 93, 305, 192, 3, 1),  # x2 blocks
    ("s2b0 k5 s2", 93, 305, 192, 5, 2),
    ("s2b1 k5 s1", 47, 153, 288, 5, 1),  # x2
    ("s3b0 k3 s2", 47, 153, 288, 3, 2),
    ("s3b1 k3 s1", 24, 77, 576, 3, 1),  # x4
    ("s4b0 k5 s1", 24, 77, 576, 5, 1),
    ("s4b1 k5 s1", 24, 77, 816, 5, 1),  # x4
    ("s5b0 k5 s2", 24, 77, 816, 5, 2),
    ("s5b1 k5 s1", 12, 39, 1392, 5, 1),  # x5
    ("s6b0 k3 s1", 12, 39, 1392, 3, 1),  # x2
]
# how many times each shape occurs in one b3 forward
B3_DW_COUNTS = [1, 1, 1, 2, 1, 2, 1, 4, 1, 4, 1, 5, 2]


def dw_conv(x, w, stride):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--check", action="store_true",
                    help="compiled-vs-oracle exactness on this backend "
                         "(pins the Mosaic lowering the CPU interpret-mode "
                         "tests cannot reach); skips all timing")
    args = ap.parse_args()
    enable()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    from occdepth_tpu.ops.dw_conv import (
        dw_filter_grad_pallas,
        dw_filter_grad_reference,
    )

    if args.check:
        # compiled Mosaic exactness vs the fp32 oracle, every stride-1
        # encoder shape (interpret-mode coverage lives in test_dw_conv.py)
        worst = 0.0
        for name, H, W, C, k, s in B3_DW_SHAPES:
            if s != 1:
                continue
            kx, kg = jax.random.split(jax.random.PRNGKey(1))
            x = jax.random.normal(kx, (1, H, W, C), dtype)
            g = jax.random.normal(kg, (1, H, W, C), dtype)
            ref = dw_filter_grad_reference(x, g, k, k)
            out = jax.jit(
                lambda x, g, k=k: dw_filter_grad_pallas(x, g, k, k)
            )(x, g)
            err = float(jnp.max(jnp.abs(out - ref)))
            rel = err / max(1e-30, float(jnp.max(jnp.abs(ref))))
            worst = max(worst, rel)
            print(f"{name:14s} max|err| {err:9.3e}  rel {rel:9.3e}")
        print(json.dumps({
            "backend": jax.default_backend(),
            "dtype": args.dtype,
            "worst_rel_err": worst,
            "ok": worst < 1e-2 if dtype == jnp.bfloat16 else worst < 1e-5,
        }))
        return

    results = {}
    tot = {"fwd": 0.0, "dx": 0.0, "dw": 0.0, "dw_pallas": 0.0}
    print(f"{'shape':14s} {'fwd':>7s} {'dx':>7s} {'dw':>7s} {'dw_pal':>7s}")
    for (name, H, W, C, k, s), count in zip(B3_DW_SHAPES, B3_DW_COUNTS):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (1, H, W, C), dtype)
        w = jax.random.normal(key, (k, k, 1, C), jnp.float32)
        Ho = -(-H // s)
        g = jax.random.normal(key, (1, Ho, -(-W // s), C), dtype)

        fwd = lambda x, w: dw_conv(x, w.astype(x.dtype), s)
        t_fwd = timeit(fwd, x, w, K=args.repeats)
        t_dx = timeit(
            lambda x, w, g: jax.vjp(lambda x2: fwd(x2, w), x)[1](g)[0],
            x, w, g, K=args.repeats,
        )
        t_dw = timeit(
            lambda x, w, g: jax.vjp(lambda w2: fwd(x, w2), w)[1](g)[0],
            x, w, g, K=args.repeats,
        )
        t_pal = float("nan")
        if s == 1:
            t_pal = timeit(
                lambda x, w, g: dw_filter_grad_pallas(x, g, k, k),
                x, w, g, K=args.repeats,
            )
        results[name] = {
            "fwd_ms": round(t_fwd, 3), "dx_ms": round(t_dx, 3),
            "dw_ms": round(t_dw, 3), "dw_pallas_ms": round(t_pal, 3),
            "count": count,
        }
        tot["fwd"] += t_fwd * count
        tot["dx"] += t_dx * count
        tot["dw"] += t_dw * count
        tot["dw_pallas"] += (t_pal if t_pal == t_pal else t_dw) * count
        print(f"{name:14s} {t_fwd:7.3f} {t_dx:7.3f} {t_dw:7.3f} {t_pal:7.3f}"
              f"  x{count}")
    print(f"{'TOTAL (b3 x1 view)':14s} fwd {tot['fwd']:6.2f}  dx "
          f"{tot['dx']:6.2f}  dw {tot['dw']:6.2f}  "
          f"dw_pallas(+s2 xla) {tot['dw_pallas']:6.2f} ms")
    if args.json:
        print(json.dumps({"totals_ms": {k: round(v, 2) for k, v in
                                        tot.items()}, "per_shape": results}))


if __name__ == "__main__":
    main()
