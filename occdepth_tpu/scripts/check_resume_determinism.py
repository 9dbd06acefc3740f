"""End-to-end kill/resume determinism check through the real train CLI.

Reference behavior to match: Lightning auto-resume from last.ckpt
(occdepth/scripts/train.py:173-206) — a crashed run, restarted with the
same command, continues as if never interrupted.  Our trainer makes the
stronger guarantee that the post-resume loss trajectory is BITWISE
identical to an uninterrupted run (epoch-boundary checkpoints +
epoch-counter-keyed shuffle order + per-(seed, epoch, index) augmentation
RNG; training/trainer.py:150-164), and this script proves it end to end:

  1. builds the synthetic TartanAir toy tree (4 train / 4 val frames);
  2. run A: trains `--epochs` epochs straight through, logging every step;
  3. run B: same command, SIGKILLed mid-run once metrics.jsonl crosses
     `--kill-step`, then relaunched verbatim (auto-resume picks up the
     last epoch-boundary checkpoint and replays the interrupted epoch);
  4. asserts every logged metric (per-step train losses, lr, epoch val
     metrics) of run B equals run A bitwise at every step, and that the
     final `last` checkpoints are bitwise-identical pytrees.

Artifacts land in --base: A/metrics.jsonl, B/metrics.jsonl, and a
summary JSON printed at the end (committed copy:
docs/artifacts/resume_determinism_r3.json).

    python -m occdepth_tpu.scripts.check_resume_determinism \
        --base /tmp/resume_check --epochs 60 --kill-step 140
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
SKIP_KEYS = {"time", "steps_per_sec"}


def build_tree(base: str) -> None:
    script = os.path.join(REPO, ".claude", "skills", "verify", "assets",
                          "make_ta_tree.py")
    subprocess.run([sys.executable, script, base], check=True)


def train_cmd(base: str, logdir: str, epochs: int):
    cfg = os.path.join(REPO, "occdepth_tpu", "configs", "tartanair",
                       "flosp_crp_cascadecls.yaml")
    return [
        sys.executable, "-m", "occdepth_tpu.scripts.train",
        "--config", cfg,
        f"max_epochs={epochs}",
        "num_workers_per_gpu=0",
        f"data_root={base}/ta",
        f"data_preprocess_root={base}/ta_pre",
        "full_scene_size=[16,8,16]",
        "scene_size_m=[4.8,2.4,4.8]",
        "voxel_size_m=0.3",
        "feature=16",
        "feature_2d_oc=16",
        "frustum_size=2",
        "project_1_8=false",
        "compute_dtype=float32",
        "log_every_n_steps=1",
        f"logdir={logdir}",
    ]


def metrics_path(logdir: str) -> str:
    hits = glob.glob(os.path.join(logdir, "exp_*", "metrics.jsonl"))
    return hits[0] if hits else ""


def read_records(logdir: str):
    """step -> last-written record (a resumed run replays the partial
    epoch; the rewrite must equal the original, which `compare` checks
    against run A — here we keep the final word per step)."""
    recs = {}
    with open(metrics_path(logdir)) as f:
        for line in f:
            r = json.loads(line)
            key = (r["step"], "val/mIoU" in r)  # train + epoch records
            recs[key] = r
    return recs


def run_to_completion(cmd, log_file):
    with open(log_file, "a") as lf:
        subprocess.run(cmd, check=True, stdout=lf, stderr=subprocess.STDOUT)


def run_and_kill(cmd, log_file, logdir, kill_step, poll=2.0):
    with open(log_file, "a") as lf:
        proc = subprocess.Popen(cmd, stdout=lf, stderr=subprocess.STDOUT)
    try:
        while proc.poll() is None:
            time.sleep(poll)
            mp = metrics_path(logdir)
            if not mp:
                continue
            last = 0
            with open(mp) as f:
                for line in f:
                    try:
                        last = max(last, json.loads(line)["step"])
                    except Exception:
                        pass
            if last >= kill_step:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                return last
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    raise RuntimeError(
        f"run finished (rc={proc.returncode}) before reaching "
        f"kill step {kill_step}"
    )


def compare(rec_a, rec_b):
    mismatches = []
    common = sorted(set(rec_a) & set(rec_b))
    missing = sorted(set(rec_a) ^ set(rec_b))
    n_vals = 0
    for key in common:
        a, b = rec_a[key], rec_b[key]
        for k in sorted(set(a) | set(b)):
            if k in SKIP_KEYS:
                continue
            va, vb = a.get(k), b.get(k)
            n_vals += 1
            if va != vb:  # bitwise: JSON repr round-trips float64 exactly
                mismatches.append((key, k, va, vb))
    return common, missing, n_vals, mismatches


def load_ckpt_tree(logdir: str):
    import numpy as np
    import orbax.checkpoint as ocp

    hits = glob.glob(os.path.join(logdir, "exp_*", "checkpoints", "last"))
    assert hits, f"no last checkpoint under {logdir}"
    tree = ocp.PyTreeCheckpointer().restore(hits[0])
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/resume_check")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--kill-step", type=int, default=140)
    args = ap.parse_args()

    os.makedirs(args.base, exist_ok=True)
    build_tree(args.base)
    dir_a = os.path.join(args.base, "A")
    dir_b = os.path.join(args.base, "B")

    t0 = time.time()
    print(f"run A: {args.epochs} epochs straight through", flush=True)
    run_to_completion(train_cmd(args.base, dir_a, args.epochs),
                      os.path.join(args.base, "A.log"))
    print(f"run A done in {time.time() - t0:.0f}s", flush=True)

    t1 = time.time()
    print(f"run B: SIGKILL at step >= {args.kill_step}, then resume",
          flush=True)
    killed_at = run_and_kill(
        train_cmd(args.base, dir_b, args.epochs),
        os.path.join(args.base, "B.log"), dir_b, args.kill_step,
    )
    print(f"run B killed at step {killed_at}; relaunching", flush=True)
    run_to_completion(train_cmd(args.base, dir_b, args.epochs),
                      os.path.join(args.base, "B.log"))
    print(f"run B done in {time.time() - t1:.0f}s", flush=True)

    rec_a, rec_b = read_records(dir_a), read_records(dir_b)
    common, missing, n_vals, mismatches = compare(rec_a, rec_b)
    import numpy as np

    ck_a, ck_b = load_ckpt_tree(dir_a), load_ckpt_tree(dir_b)
    ck_diff = [k for k in sorted(set(ck_a) | set(ck_b))
               if k not in ck_a or k not in ck_b
               or not np.array_equal(ck_a[k], ck_b[k])]

    summary = {
        "metric": "resume_determinism",
        "epochs": args.epochs,
        "killed_at_step": killed_at,
        "records_compared": len(common),
        "values_compared": n_vals,
        "records_missing_either_side": len(missing),
        "value_mismatches": len(mismatches),
        "checkpoint_leaves": len(ck_a),
        "checkpoint_leaf_mismatches": len(ck_diff),
        "ok": not mismatches and not missing and not ck_diff,
    }
    print(json.dumps(summary))
    for m in mismatches[:20]:
        print("MISMATCH", m)
    for k in ck_diff[:20]:
        print("CKPT-MISMATCH", k)
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
