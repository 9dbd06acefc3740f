"""Benchmark: flagship SemanticKITTI stereo inference throughput on TPU.

Measures steady-state frames/sec of the full stereo pipeline (EfficientNet
x2 views -> FLoSP/SFA lift -> OAD frustum resample -> 3D UNet + CRP +
cascade heads) at the reference's full resolution: 370x1220 stereo pairs,
256x256x32 output grid (multicam_flospdepth_crp_stereodepth_cascadecls
config), bf16 compute.

Baseline: the reference publishes no fps numbers (SURVEY.md §6).  We assume
2.0 frames/sec for the reference implementation on its RTX 2080 Ti training
GPU (OccDepth-class SSC models run ~0.4-0.6 s/frame on that class of GPU);
BASELINE.json's target is >= 5x that per v5e chip, i.e. vs_baseline >= 5.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

BASELINE_2080TI_FPS = 2.0


def main():
    import jax

    from occdepth_tpu.utils.compilation_cache import enable

    enable()

    from __graft_entry__ import entry

    fn, (variables, batch) = entry()
    jfn = jax.jit(fn)

    # Upload inputs once: projection tables/calibration are per-sequence
    # constants in deployment, and images stream asynchronously; measuring
    # device throughput must not count re-uploading them every step.
    # NOTE: inputs must DIFFER between iterations — the axon proxy backend
    # replays cached results for bit-identical executions, which would fake
    # the measurement.
    variables = jax.device_put(variables)
    n_distinct = 8
    batches = []
    for i in range(n_distinct):
        b = dict(batch)
        b["img"] = batch["img"] + (i + 1) * 1e-3
        batches.append(jax.device_put(b))

    # warmup + compile
    out = jfn(variables, batches[0])
    jax.block_until_ready(out)

    n_iters = 24
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = jfn(variables, batches[i % n_distinct])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    batch_frames = batch["img"].shape[0]
    fps = n_iters * batch_frames / dt
    print(json.dumps({
        "metric": "semantickitti_stereo_inference_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_2080TI_FPS, 3),
    }))


if __name__ == "__main__":
    main()
