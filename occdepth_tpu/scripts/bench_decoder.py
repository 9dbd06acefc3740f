"""Ablate the 2D decoder (UpSampleBN pyramid) to locate its device time.

    python -m occdepth_tpu.scripts.bench_decoder
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from occdepth_tpu.models.layers import BatchNorm, leaky_relu, torch_conv
from occdepth_tpu.models.unet2d import UpSampleBN
from occdepth_tpu.ops.resize import resize_bilinear
from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

H, W = 370, 1220
F = 1536  # b3 head features


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    enable()
    K = args.repeats
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)

    # (name, in_ch_up, skip_ch, out_ch, out_h, out_w) mirroring DecoderBN for
    # b3: x_d0 (12, 39, 1536) -> up16 768 @ (24,77) -> up8 384 @ (47,153)
    # -> up4 192 @ (93,305) -> up2 96 @ (185,610) -> up1 48 @ (370,1220)
    levels = [
        ("up16", F, 136, F // 2, 24, 77),
        ("up8", F // 2, 48, F // 4, 47, 153),
        ("up4", F // 4, 32, F // 8, 93, 305),
        ("up2", F // 8, 24, F // 16, 185, 610),
        ("up1", F // 16, 3, F // 32, 370, 1220),
    ]
    total = 0.0
    for name, cin, cskip, cout, oh, ow in levels:
        ih, iw = -(-oh // 2), -(-ow // 2)
        mod = UpSampleBN(cout, dtype=dtype)
        x = jnp.asarray(rs.randn(2, ih, iw, cin).astype(np.float32), dtype)
        skip = jnp.asarray(rs.randn(2, oh, ow, cskip).astype(np.float32), dtype)
        v = jax.jit(mod.init, static_argnames=("train",))(rng, x, skip, train=False)
        t = timeit(lambda a, b: mod.apply(v, a, b, train=False), x, skip, K=K)
        total += t

        # split: resize vs convs
        t_rs = timeit(
            lambda a: resize_bilinear(a, (oh, ow), align_corners=True), x, K=K)
        print(f"  {name}: {t:6.2f} ms  (resize {t_rs:5.2f}, "
              f"convs ~{t - t_rs:5.2f})  [{ih}x{iw}x{cin} -> {oh}x{ow}x{cout}]")
    print(f"  sum of levels:     {total:6.2f} ms (2 views)")

    # the five 1x1 resize_output convs
    t_ro = 0.0
    for s, (oh, ow, cin) in {
        1: (370, 1220, F // 32), 2: (185, 610, F // 16),
        4: (93, 305, F // 8), 8: (47, 153, F // 4), 16: (24, 77, F // 2),
    }.items():
        conv = torch_conv(32, (1, 1), padding=(0, 0), dtype=dtype)
        x = jnp.asarray(rs.randn(2, oh, ow, cin).astype(np.float32), dtype)
        v = conv.init(rng, x)
        t_ro += timeit(lambda a: conv.apply(v, a), x, K=K)
    print(f"  resize_output 1x1: {t_ro:6.2f} ms")

    # isolated big conv experiments at the 1_1 level
    for cin, cout, label in [
        (99, 48, "conv0 up1 (99->48)"),
        (128, 48, "padded in (128->48)"),
        (99, 64, "padded out (99->64)"),
        (128, 64, "padded both (128->64)"),
        (128, 128, "padded both (128->128)"),
    ]:
        conv = torch_conv(cout, (3, 3), dtype=dtype)
        x = jnp.asarray(rs.randn(2, H, W, cin).astype(np.float32), dtype)
        v = conv.init(rng, x)
        t = timeit(lambda a: conv.apply(v, a), x, K=K)
        gf = 2 * 2 * H * W * 9 * cin * cout / 1e9
        print(f"  {label:24s} {t:6.2f} ms  ({gf / t:.1f} TF/s)")


if __name__ == "__main__":
    main()
