"""Dump one collated batch to a pickle (test fixture tool).

Equivalent of the reference DataModule __main__ smoke blocks that write
`data.pkl` (kitti_dm.py:146-182, nyu_dm.py:103-132): grabs one batch from
the real dataset when data is available, otherwise a synthetic
geometry-consistent batch, so model smoke tests have a fixture.

    python -m occdepth_tpu.scripts.dump_batch --config <yaml> --out data.pkl \
        [--synthetic] [--split val]
"""
from __future__ import annotations

import argparse
import pickle

from occdepth_tpu.config import load_config, parse_overrides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))

    if args.synthetic:
        from occdepth_tpu.data.batch import make_synthetic_batch

        batch = make_synthetic_batch(cfg, batch_size=args.batch_size)
    else:
        from occdepth_tpu.data.kitti import Loader
        from occdepth_tpu.training.trainer import make_datasets

        train_ds, val_ds = make_datasets(cfg)
        ds = train_ds if args.split == "train" else val_ds
        loader = Loader(ds, args.batch_size, shuffle=False, drop_last=False,
                        num_workers=0)
        batch = next(iter(loader))

    with open(args.out, "wb") as f:
        pickle.dump(batch, f)
    print("wrote", args.out, "keys:", sorted(batch.keys()))


if __name__ == "__main__":
    main()
