"""Orbax checkpointing: params + BN stats + optimizer state + step.

TPU equivalent of the reference's Lightning ModelCheckpoint pair
(scripts/train.py:149-168: top-1 val/mIoU, top-1 val/IoU, save_last) and
auto-resume from last.ckpt (scripts/train.py:173-206).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    """Keeps `last` plus best-by-metric checkpoints, like the reference."""

    def __init__(self, directory: str, monitors=("val/mIoU", "val/IoU")):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitors = monitors
        self.best: Dict[str, float] = {}
        self._ckptr = ocp.PyTreeCheckpointer()
        self._meta_path = os.path.join(self.directory, "meta.json")
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                self.best = json.load(f).get("best", {})

    def _save(self, name: str, state: Any, step: int):
        path = os.path.join(self.directory, name)
        tree = jax.device_get(state)
        self._ckptr.save(path, tree, force=True)
        with open(self._meta_path, "w") as f:
            json.dump({"best": self.best, "last_step": step}, f)

    def save(self, state: Any, step: int, metrics: Optional[Dict[str, float]] = None):
        """Save `last`; update best-by-monitor checkpoints if improved."""
        self._save("last", state, step)
        if metrics:
            for mon in self.monitors:
                if mon in metrics and metrics[mon] > self.best.get(mon, -np.inf):
                    self.best[mon] = float(metrics[mon])
                    safe = mon.replace("/", "_")
                    self._save(f"best_{safe}", state, step)

    def restore(self, target: Any, name: str = "last") -> Optional[Any]:
        """Restore into the structure of `target`; None if absent."""
        path = os.path.join(self.directory, name)
        if not os.path.exists(path):
            return None
        return self._ckptr.restore(path, item=jax.device_get(target))

    def has(self, name: str = "last") -> bool:
        return os.path.exists(os.path.join(self.directory, name))
