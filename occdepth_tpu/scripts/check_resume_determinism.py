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
docs/artifacts/resume_determinism_r4.json).

The toy tree trains 2 steps/epoch (4 samples, batch 2), so `--epochs 60`
is 120 total steps; `--kill-step` must be < that and odd to land the
SIGKILL mid-epoch (default 61 = during epoch 31, one step past the
epoch-30 checkpoint).  `--reuse-a` skips rerunning run A when its
metrics.jsonl already holds a complete straight-through run (~50 min on
this host), e.g. when only run B needs repeating.

    python -m occdepth_tpu.scripts.check_resume_determinism \
        --base /tmp/resume_check --epochs 60 --kill-step 61
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
    from occdepth_tpu.testing import make_tartanair_tree

    make_tartanair_tree(base)


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
    # exp dirs are named "<exp_prefix>_run<N>"; the prefix varies by
    # dataset (e.g. "kitti_exp_..." vs "exp_..."), so match any child dir
    # (a bare "exp_*" glob missed the KITTI prefix and made the kill-poll
    # spin forever — round-5 fix)
    hits = glob.glob(os.path.join(logdir, "*", "metrics.jsonl"))
    return hits[0] if hits else ""


def read_records(logdir: str):
    """step -> last-written record (a resumed run replays the partial
    epoch; the rewrite must equal the original, which `compare` checks
    against run A — here we keep the final word per step)."""
    recs = {}
    with open(metrics_path(logdir)) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                # a SIGKILL mid-write can truncate the final line of run
                # B's interrupted segment; the resumed run rewrites the
                # step, so skipping it is correct (compare() still checks
                # every step against run A)
                continue
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
                return last, True
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    # the process exited between polls: re-read metrics once — it may
    # have crossed kill_step right before finishing (short runs)
    last = 0
    mp = metrics_path(logdir)
    if mp:
        with open(mp) as f:
            for line in f:
                try:
                    last = max(last, json.loads(line)["step"])
                except Exception:
                    pass
    if last >= kill_step:
        print(
            f"WARNING: run B finished (rc={proc.returncode}) before the "
            f"SIGKILL landed (reached step {last} >= {kill_step}); the "
            "resume path was NOT exercised — rerun with a smaller "
            "--kill-step for a meaningful check", flush=True,
        )
        return last, False
    raise RuntimeError(
        f"run finished (rc={proc.returncode}) at step {last}, before "
        f"reaching kill step {kill_step} — lower --kill-step"
    )


def compare(rec_a, rec_b):
    mismatches = []
    common = sorted(set(rec_a) & set(rec_b))
    missing = sorted(set(rec_a) ^ set(rec_b))
    n_vals = 0
    for key in common:
        a, b = rec_a[key], rec_b[key]
        for k in sorted(set(a) | set(b)):
            if k in SKIP_KEYS or k.rsplit("/", 1)[-1] in SKIP_KEYS:
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
        elif isinstance(node, (list, tuple)):
            # orbax restores tuples (e.g. optax opt_state chains) as lists
            for i, v in enumerate(node):
                walk(f"{prefix}/{i}", v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    return flat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/tmp/resume_check")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--kill-step", type=int, default=61)
    ap.add_argument("--reuse-a", action="store_true",
                    help="skip run A when --base/A already holds a "
                         "complete straight-through run")
    ap.add_argument("--compare-only", action="store_true",
                    help="skip BOTH runs and just compare existing A/B "
                         "metrics + checkpoints (e.g. after an "
                         "orchestrator crash mid-comparison); requires "
                         "--killed-at to record where the kill landed")
    ap.add_argument("--killed-at", type=int, default=None,
                    help="(with --compare-only) the step run B was "
                         "SIGKILLed at, from the original run's log")
    args = ap.parse_args()

    os.makedirs(args.base, exist_ok=True)
    dir_a = os.path.join(args.base, "A")
    dir_b = os.path.join(args.base, "B")
    if args.compare_only:
        assert metrics_path(dir_a) and metrics_path(dir_b), \
            "--compare-only needs completed A and B runs under --base"
        assert args.killed_at is not None, "--compare-only needs --killed-at"
        # the train CLI logs "resumed from step N" when auto-resume fired;
        # require that evidence so compare-only can't bless a B that was
        # never actually interrupted
        with open(os.path.join(args.base, "B.log")) as f:
            resumed = any("resumed from step" in line for line in f)
        finish(args, dir_a, dir_b, killed_at=args.killed_at,
               was_killed=resumed)
        return
    build_tree(args.base)
    if os.path.isdir(dir_b):
        import shutil

        # a stale B (e.g. an earlier attempt that completed without
        # being killed) would auto-resume as already-finished and skip
        # the resume path entirely
        shutil.rmtree(dir_b)

    t0 = time.time()
    if args.reuse_a and metrics_path(dir_a):
        print(f"run A: reusing existing {metrics_path(dir_a)}", flush=True)
    else:
        print(f"run A: {args.epochs} epochs straight through", flush=True)
        run_to_completion(train_cmd(args.base, dir_a, args.epochs),
                          os.path.join(args.base, "A.log"))
        print(f"run A done in {time.time() - t0:.0f}s", flush=True)

    t1 = time.time()
    print(f"run B: SIGKILL at step >= {args.kill_step}, then resume",
          flush=True)
    killed_at, was_killed = run_and_kill(
        train_cmd(args.base, dir_b, args.epochs),
        os.path.join(args.base, "B.log"), dir_b, args.kill_step,
    )
    print(f"run B killed at step {killed_at}; relaunching", flush=True)
    run_to_completion(train_cmd(args.base, dir_b, args.epochs),
                      os.path.join(args.base, "B.log"))
    print(f"run B done in {time.time() - t1:.0f}s", flush=True)
    finish(args, dir_a, dir_b, killed_at, was_killed)


def finish(args, dir_a, dir_b, killed_at, was_killed):
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
        "resume_exercised": was_killed,
        "records_compared": len(common),
        "values_compared": n_vals,
        "records_missing_either_side": len(missing),
        "value_mismatches": len(mismatches),
        "checkpoint_leaves": len(ck_a),
        "checkpoint_leaf_mismatches": len(ck_diff),
        "ok": (was_killed and not mismatches and not missing
               and not ck_diff),
    }
    print(json.dumps(summary))
    for m in mismatches[:20]:
        print("MISMATCH", m)
    for k in ck_diff[:20]:
        print("CKPT-MISMATCH", k)
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
