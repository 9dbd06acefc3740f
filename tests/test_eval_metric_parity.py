"""End-to-end metric-TABLE parity vs the torch oracle (VERDICT r3 #3).

Logits parity (test_full_model_parity / test_fullres_parity) and
SSCMetrics unit tests existed separately; this test composes the WHOLE
eval pipeline through both stacks and asserts the final printed table is
identical — the strongest released-checkpoint mIoU proxy obtainable
without real data:

  torch stack (reference semantics, occdepth/scripts/eval.py:78-85 +
  models/OccDepth.py:526-529 + loss/sscMetrics.py:131-204):
      oracle forward -> argmax over classes -> per-class loop tp/fp/fn
      accumulation (the literal reference algorithm, reimplemented below)
      -> get_stats -> P/R/IoU + per-class IoU + mIoU table.

  our stack (what scripts/eval.py runs):
      convert_state_dict(oracle ckpt) -> make_eval_step (jitted forward +
      argmax + on-device confusion) over the same batches, including the
      ragged-final-batch sample_valid padding of Trainer.validate
      (training/trainer.py:240-281) -> SSCMetrics.get_stats ->
      scripts/eval.py print_stats.

Asserts: binarized completion counts exactly equal, per-class tp/fp/fn
exactly equal (zero argmax flips), stats bitwise-close, and the printed
tables string-identical.
"""
import io
from contextlib import redirect_stdout

import numpy as np
import torch

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.losses.metrics import SSCMetrics
from occdepth_tpu.scripts.eval import print_stats
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.convert_torch import convert_state_dict
from occdepth_tpu.training.step import make_eval_step
from tests.torch_oracle import TorchOccDepth, randomize_bn


class RefSSCMetrics:
    """The reference's loop-based accumulator, semantics-for-semantics
    (occdepth/loss/sscMetrics.py:70-204): 255 voxels are remapped to class
    0 in both pred and target, completion is binarized occupancy tp/fp/fn,
    semantic counts are per-class loops over every voxel."""

    def __init__(self, n_classes):
        self.n_classes = n_classes
        self.completion_tp = self.completion_fp = self.completion_fn = 0
        self.tps = np.zeros(n_classes, np.int64)
        self.fps = np.zeros(n_classes, np.int64)
        self.fns = np.zeros(n_classes, np.int64)

    def add_batch(self, y_pred, y_true):
        pred = np.copy(y_pred).reshape(y_pred.shape[0], -1)
        true = np.copy(y_true).reshape(y_true.shape[0], -1)
        pred[true == 255] = 0
        true[true == 255] = 0
        for idx in range(pred.shape[0]):
            p, t = pred[idx], true[idx]
            bp, bt = p > 0, t > 0
            self.completion_tp += int(np.sum(bt & bp))
            self.completion_fp += int(np.sum(~bt & bp))
            self.completion_fn += int(np.sum(bt & ~bp))
            for j in range(self.n_classes):
                self.tps[j] += int(np.sum((t == j) & (p == j)))
                self.fps[j] += int(np.sum((t != j) & (p == j)))
                self.fns[j] += int(np.sum((t == j) & (p != j)))

    def get_stats(self):
        if self.completion_tp != 0:
            precision = self.completion_tp / (
                self.completion_tp + self.completion_fp
            )
            recall = self.completion_tp / (
                self.completion_tp + self.completion_fn
            )
            iou = self.completion_tp / (
                self.completion_tp + self.completion_fp + self.completion_fn
            )
        else:
            precision = recall = iou = 0
        iou_ssc = self.tps / (self.tps + self.fps + self.fns + 1e-5)
        return {
            "precision": precision,
            "recall": recall,
            "iou": iou,
            "iou_ssc": iou_ssc,
            "iou_ssc_mean": np.mean(iou_ssc[1:]),
        }


def _table(stats, class_names):
    buf = io.StringIO()
    with redirect_stdout(buf):
        print_stats(stats, class_names)
    return buf.getvalue()


def test_eval_metric_table_matches_torch_oracle():
    cfg = tiny_kitti_config()
    torch.manual_seed(11)
    oracle = TorchOccDepth(cfg).eval()
    randomize_bn(oracle, seed=11)

    # val "epoch": two full batches of 2 + a ragged final batch of 1
    # (exercises Trainer.validate's sample_valid padding, the static-shape
    # replacement for the reference's dynamic final batch)
    batches = [
        make_synthetic_batch(cfg, batch_size=2, seed=100),
        make_synthetic_batch(cfg, batch_size=2, seed=101),
        make_synthetic_batch(cfg, batch_size=1, seed=102),
    ]

    # ---- torch stack ----
    ref_metrics = RefSSCMetrics(cfg.n_classes)
    t = lambda x: torch.from_numpy(np.asarray(x))
    for b in batches:
        with torch.no_grad():
            out = oracle(
                t(b["img"]).permute(0, 1, 4, 2, 3).contiguous(),
                t(b["projected_pix"]).long(),
                t(b["fov_mask"]),
                t(b["cam_k"]),
                t(b["T_velo_2_cam"]),
                t(b["ida_mats"]),
            )
        # reference step: np.argmax over the class axis
        # (models/OccDepth.py:526-529)
        y_pred = np.argmax(out["ssc_logit"].numpy(), axis=1)
        ref_metrics.add_batch(y_pred, np.asarray(b["target"]))
    ref_stats = ref_metrics.get_stats()

    # ---- our stack (the scripts/eval.py composition) ----
    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params, stats_tree, missing = convert_state_dict(sd, cfg)
    assert not missing, missing[:10]
    eval_step = make_eval_step(cfg)
    metrics = SSCMetrics(cfg.n_classes)
    gb = 2
    for b in batches:
        b = dict(b)
        bs = b["img"].shape[0]
        valid = np.ones((gb,), bool)
        if bs < gb:  # Trainer.validate's padding (trainer.py:259-266)
            valid[bs:] = False
            b = {k: np.concatenate([v] + [v[:1]] * (gb - bs))
                 for k, v in b.items()}
        b["sample_valid"] = valid
        _, completion, conf = eval_step(params, stats_tree, b)
        metrics.merge_device(completion, conf)
    got_stats = metrics.get_stats()

    # per-class tp/fp/fn derived from our confusion matrix must equal the
    # reference loop's counters exactly (zero argmax flips end-to-end)
    conf = metrics.conf
    np.testing.assert_array_equal(np.diag(conf), ref_metrics.tps)
    np.testing.assert_array_equal(conf.sum(0) - np.diag(conf),
                                  ref_metrics.fps)
    np.testing.assert_array_equal(conf.sum(1) - np.diag(conf),
                                  ref_metrics.fns)
    np.testing.assert_array_equal(
        metrics.completion,
        [ref_metrics.completion_tp, ref_metrics.completion_fp,
         ref_metrics.completion_fn],
    )

    # the full stats dict and the printed table must agree
    for k in ("precision", "recall", "iou", "iou_ssc_mean"):
        np.testing.assert_allclose(got_stats[k], ref_stats[k], rtol=1e-12,
                                   err_msg=k)
    np.testing.assert_allclose(got_stats["iou_ssc"], ref_stats["iou_ssc"],
                               rtol=1e-12)

    from occdepth_tpu.data.params import class_names_for

    names = class_names_for(cfg.dataset)
    assert _table(got_stats, names) == _table(ref_stats, names)
