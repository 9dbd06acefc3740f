"""Evaluation CLI: run the val split and print the SSC metric table.

Equivalent of occdepth/scripts/eval.py (loads a checkpoint, trainer.test on
the val dataloader, prints Precision/Recall/IoU + per-class IoU + mIoU —
OccDepth.test_epoch_end, models/OccDepth.py:562-580), plus device memory
stats (the reference prints torch.cuda.max_memory_allocated).
"""
from __future__ import annotations

import argparse

import jax

from occdepth_tpu.config import load_config, parse_overrides
from occdepth_tpu.data.params import class_names_for
from occdepth_tpu.training.trainer import Trainer, make_datasets


def print_stats(stats, class_names):
    print("test======")
    print(
        "Precision={:.4f}, Recall={:.4f}, IoU={:.4f}".format(
            stats["precision"] * 100, stats["recall"] * 100,
            stats["iou"] * 100,
        )
    )
    print("class IoU: {}, ".format(class_names))
    print(" ".join(
        "{:.4f},".format(x * 100) for x in stats["iou_ssc"].tolist()
    ))
    print("mIoU={:.4f}".format(stats["iou_ssc_mean"] * 100))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ckpt", default="last",
                    help="checkpoint name under <logdir>/<exp>/checkpoints")
    ap.add_argument("--torch-ckpt", default=None,
                    help="reference PyTorch .ckpt/.pt to convert and "
                         "evaluate (the released-checkpoint parity path; "
                         "reference scripts/eval.py:65-70)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()
    cfg = load_config(args.config, parse_overrides(args.overrides))
    from occdepth_tpu.utils.compilation_cache import enable

    enable()
    trainer = Trainer(cfg)
    _, val_ds = make_datasets(cfg)
    from occdepth_tpu.data.kitti import Loader
    from occdepth_tpu.training.optim import make_optimizer
    from occdepth_tpu.training.step import init_state
    from occdepth_tpu.training.trainer import strip_metadata

    val_loader = Loader(val_ds, trainer.global_batch, shuffle=False,
                        drop_last=False)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    example = strip_metadata(next(iter(val_loader)))
    state = init_state(cfg, jax.random.PRNGKey(0), example, tx)
    import jax.numpy as jnp

    if args.torch_ckpt:
        from occdepth_tpu.training.convert_torch import load_torch_into_state

        state = load_torch_into_state(state, args.torch_ckpt, cfg)
    else:
        restored = trainer.ckpt.restore(state, args.ckpt)
        if restored is None:
            raise SystemExit(
                f"checkpoint '{args.ckpt}' not found under "
                f"{trainer.ckpt.directory}"
            )
        state = jax.tree_util.tree_map(jnp.asarray, restored)

    stats = trainer.validate(state, val_loader)
    print_stats(stats, class_names_for(cfg.dataset))
    for dev in jax.local_devices():
        try:
            ms = dev.memory_stats()
            print(f"{dev}: peak_bytes_in_use={ms.get('peak_bytes_in_use')}")
        except Exception:
            pass


if __name__ == "__main__":
    main()
