"""Device mesh + sharding helpers (the TPU replacement for Lightning DDP).

The reference's only parallelism is data parallelism over NCCL
(scripts/train.py:181-186, SURVEY.md §2.5).  Here the equivalent is a 1-D
`jax.sharding.Mesh` over a `data` axis: params/optimizer state replicated,
batch sharded on axis 0.  jit + GSPMD then inserts the gradient all-reduce
over ICI automatically, and BatchNorm statistics — computed over the global
batch axis inside jit — reduce across the mesh as well, which is exactly
`sync_batchnorm=True`.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis: str = "data"):
    """Device-put every batch array with its leading dim sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
