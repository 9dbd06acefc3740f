"""Measure the fused-SSC-head Pallas attack (VERDICT r4 next-#1 / r3 #1b).

The proposal: ONE Pallas kernel for the full-grid head chain
(conv0 -> ASPP(3 dilations x 2 convs + BN) -> cascade softmax concat ->
class conv on (1,256,256,32,16); reference occdepth/models/modules.py:
109-175) so intermediates never round-trip HBM.  Whether that can win
decomposes into two measurable questions at the EXACT flagship shapes:

  A. What does XLA already achieve?  Time one decomposed dilated conv3d
     (ops/conv3d_fast.py) and the whole fused-by-XLA eval head.
  B. What is the Pallas compute CEILING?  Any Pallas conv at C=16 must
     feed the MXU one of these matmul shapes per output tile (the
     formulation space is enumerated in docs/DESIGN.md round 5):
       - im2col  (M, 27*16=432) @ (432, 16)   [z on M; patches in VMEM]
       - dz-pack (M, 9*16=144) @ (144, 3*16=48) [+ VPU z shift-add]
       - lane-fold (M, 512) @ (512, 512) block-banded I_32 (x) W
         [z in lanes; 1/32 density -> 32x padded flops, measured too]
     This script times each shape as a bare Pallas matmul kernel with the
     patch operand RESIDENT in VMEM (index_map pins one block), i.e. the
     patch-construction cost is taken as ZERO — a strict upper bound on
     any real fused kernel, which must also build patches with VPU
     rolls/selects and eat halo-redundant compute at tile edges.

If ceiling(B) >= measured(A) per conv, the fused kernel cannot beat the
decomposed-XLA chain no matter how good the fusion, and the attack is
rejected on measurement (the verdict table lives in docs/DESIGN.md).

    python -m occdepth_tpu.scripts.bench_head_pallas [--repeats 6]
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occdepth_tpu.scripts.bench_components2 import timeit
from occdepth_tpu.utils.compilation_cache import enable

# flagship head shapes: full scene grid, f//2 = 16 planes
X, Y, Z, C = 256, 256, 32, 16
M_TOTAL = X * Y * Z  # 2.097M voxels
USEFUL_FLOPS = 2 * M_TOTAL * C * 27 * C  # one 3x3x3 conv, 29 GFLOP


def _matmul_kernel(p_ref, w_ref, o_ref):
    o_ref[0] = jnp.dot(
        p_ref[0], w_ref[:], preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def pallas_matmul_probe(m_tile: int, k: int, n: int, n_steps: int):
    """Chained matmuls (m_tile,k)@(k,n) with the patch block RESIDENT in
    VMEM (constant index_map): pure MXU rate, zero patch-build/DMA cost."""
    p = jax.random.normal(jax.random.PRNGKey(0), (1, m_tile, k), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, n), jnp.bfloat16)

    fn = pl.pallas_call(
        _matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps, m_tile, n), jnp.bfloat16),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, m_tile, k), lambda i: (0, 0, 0)),  # resident
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m_tile, n), lambda i: (i, 0, 0)),
    )
    return fn, p, w


CHAIN = 8  # conv-equivalents per pallas_call: one call must be several ms
           # so the (tK - t1)/(K - 1) delta clears the ~30 ms tunnel-RTT
           # jitter (sub-ms per-call work measured negative in the first run)


def time_probe(m_tile, k, n, n_steps, repeats):
    """Time n_steps chained (m_tile,k)@(k,n) matmuls, patch resident."""
    fn, p, w = pallas_matmul_probe(m_tile, k, n, n_steps * CHAIN)
    return timeit(lambda p, w: fn(p, w), p, w, K=repeats) / CHAIN


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()
    enable()

    from occdepth_tpu.models.unet3d_blocks import SegmentationHead
    from occdepth_tpu.ops.conv3d_fast import conv3d_decomposed

    results = {}

    # ---- A. XLA side ----
    x = jax.random.normal(jax.random.PRNGKey(0), (1, X, Y, Z, C),
                          jnp.bfloat16)
    kern = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 3, C, C),
                             jnp.bfloat16)
    for d in (1, 2, 3):
        # chain CHAIN dependent convs per call (same RTT-jitter reasoning
        # as the pallas probes; a single ~0.3 ms conv measures negative)
        def chained_conv(x, kern, _d=d):
            for _ in range(CHAIN):
                x = conv3d_decomposed(
                    x, kern, strides=(1, 1, 1),
                    padding=((_d, _d), (_d, _d), (_d, _d)),
                    dilation=(_d, _d, _d))
            return x
        t = timeit(chained_conv, x, kern, K=args.repeats) / CHAIN
        results[f"xla_conv_d{d}_ms"] = round(t, 3)
        print(f"XLA decomposed conv3d dil={d}: {t:7.3f} ms  "
              f"({USEFUL_FLOPS / t / 1e9:.1f} TFLOP/s useful)")

    head = SegmentationHead(C, 20, (1, 2, 3), cascade_cls=True,
                            dtype=jnp.bfloat16)
    hv = jax.jit(head.init, static_argnums=(2,))(
        jax.random.PRNGKey(0), x, False
    )
    t = timeit(
        lambda v, a: head.apply(v, a, False)[0].astype(jnp.float32).sum(),
        hv, x, K=args.repeats,
    )
    results["xla_head_eval_ms"] = round(t, 3)
    print(f"XLA full head (eval fwd, 10 convs): {t:7.3f} ms")

    # ---- B. Pallas compute ceilings (patches free) ----
    # each probe is sized to ONE conv's worth of work in that formulation:
    #  - im2col: M_TOTAL outputs, K=27 taps x 16ci, N=16co
    #  - dzpack: M_TOTAL outputs, K=9 XY-taps x 16ci, N=3dz x 16co
    #    (the VPU z shift-add is taken as free)
    #  - lanefold: z rides the 512 lanes; per conv = 9 XY-tap matmuls of
    #    (65536, 512)@(512, 512) with the I_32 (x) W block-band (3/32
    #    density) -> 309 GFLOP padded per 29 GFLOP useful; probe runs the
    #    same padded flop count in (8192, 512) steps: 9*65536/8192 = 72
    probes = [
        ("im2col_432x16", 8192, 432, 16, M_TOTAL // 8192),
        ("dzpack_144x48", 8192, 144, 48, M_TOTAL // 8192),
        # m_tile 2048: at 8192 the double-buffered (m_tile, 512) out block
        # + resident in block exceed the 16M scoped-VMEM limit (24.5M)
        ("lanefold_512x512", 2048, 512, 512, 72 * 4),
    ]
    for name, m_tile, k, n, n_steps in probes:
        t = time_probe(m_tile, k, n, n_steps, args.repeats)
        rate = USEFUL_FLOPS / (t / 1e3) / 1e12
        padded = 2 * m_tile * k * n * n_steps
        results[f"pallas_{name}_ms"] = round(t, 3)
        print(f"Pallas probe {name:18s}: {t:7.3f} ms/conv-equiv  "
              f"({rate:.1f} useful TFLOP/s, "
              f"{padded / (t / 1e3) / 1e12:.1f} padded TFLOP/s; "
              f"patches assumed free)")

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
