"""Host data-pipeline throughput: KITTI Loader samples/sec on this host.

The reference's per-sample host work is its known practical bottleneck
(numba `vox2pix` + python `compute_CP_mega_matrix` re-run for EVERY
sample, kitti_dataset.py:258-301); here projections are cached per
(sequence, flip) and the CP matrix is vectorized, so the loader should
comfortably out-run the ~5 steps/s device consumption at flagship scale
even on one core.  This bench measures it: full __getitem__ + collate
over a synthetic full-size tree (370x1220 stereo PNGs, 256^2x32 labels).

    python -m occdepth_tpu.scripts.bench_loader --tree <base> [--n 24]

<base> is a tree made by .claude/skills/verify/assets/make_kitti_tree.py
(defaults to /tmp/vk if present).
"""
from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="/tmp/vk")
    ap.add_argument("--n", type=int, default=24,
                    help="number of samples to time (after warmup)")
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    from occdepth_tpu.config import OccDepthConfig
    from occdepth_tpu.data.kitti import KittiDataset, Loader

    cfg = OccDepthConfig(
        dataset="kitti",
        use_stereo_depth_gt=True,
        data_root=f"{args.tree}/kitti",
        data_preprocess_root=f"{args.tree}/pre",
        data_stereo_depth_root=f"{args.tree}/stereo_depth",
    )
    ds = KittiDataset(cfg, "train")
    print(f"dataset: {len(ds)} samples")

    # warmup: one full pass fills the per-sequence vox2pix caches (on real
    # KITTI 10 sequences serve 3,834 samples, so the cold cost amortizes
    # to noise; the synthetic tree has ~1 sample/sequence, which would
    # otherwise dominate)
    t0 = time.perf_counter()
    _ = ds[0]
    t_first = time.perf_counter() - t0
    for i in range(1, len(ds)):
        _ = ds[i]

    loader = Loader(ds, batch_size=1, shuffle=True,
                    num_workers=args.workers)
    done = 0
    t0 = time.perf_counter()
    while done < args.n:
        for b in loader:
            done += 1
            if done >= args.n:
                break
    dt = time.perf_counter() - t0
    sps = done / dt
    print(f"first sample (cold vox2pix cache): {t_first*1e3:.0f} ms")
    print(f"steady state: {sps:.2f} samples/s "
          f"({1e3/sps:.0f} ms/sample, workers={args.workers})")
    print(f"device consumption at flagship train is ~5 steps/s -> "
          f"loader headroom {sps/5.0:.1f}x")


if __name__ == "__main__":
    main()
