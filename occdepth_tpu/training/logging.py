"""Training observability: JSONL metrics log + optional TensorBoard.

Plays the role of the reference's TensorBoardLogger + LearningRateMonitor +
per-loss self.log calls (scripts/train.py:149-151, OccDepth.py step logging).
TensorBoard event files are written when the `tensorboard` package is
importable; the JSONL stream is always written and is what the eval tools
read back.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsLogger:
    def __init__(self, logdir: str, name: str = "metrics"):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, f"{name}.jsonl")
        self._file = open(self.path, "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # optional

            self._tb = SummaryWriter(log_dir=logdir)
        except Exception:
            self._tb = None

    def log(self, step: int, metrics: Dict[str, float], prefix: str = ""):
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}" if prefix else k
            try:
                record[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, record[key], step)
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()
