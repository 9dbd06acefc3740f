"""Training CLI.

Equivalent of the reference occdepth/scripts/train.py (hydra main +
Lightning Trainer) with plain argparse + `key=value` overrides:

    python -m occdepth_tpu.scripts.train \
        --config occdepth_tpu/configs/semantic_kitti/multicam_flospdepth_crp_stereodepth_cascadecls.yaml \
        logdir=/path/logdir batch_size_per_gpu=1

Auto-resumes from `<logdir>/<exp_name>/checkpoints/last` when present
(reference scripts/train.py:173-206).
"""
from __future__ import annotations

import argparse

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.training.trainer import Trainer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-steps", type=int, default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))
    from occdepth_tpu.utils.compilation_cache import enable

    enable()
    trainer = Trainer(cfg)
    trainer.fit(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
