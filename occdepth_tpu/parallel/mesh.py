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


def make_hybrid_mesh(
    n_slices: int,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("dcn", "data"),
) -> Mesh:
    """2-D ("dcn", "data") mesh for multi-slice data parallelism.

    On a multi-slice TPU deployment the outer axis spans slices (links
    cross the data-center network) and the inner axis spans the chips of
    one slice (ICI).  GSPMD then lowers the gradient all-reduce
    hierarchically: reduce inside each slice over ICI first, and only the
    per-slice partial crosses DCN.  On real hardware
    `mesh_utils.create_hybrid_device_mesh` orders devices so the inner
    axis is ICI-contiguous; for single-slice/virtual devices a plain
    reshape gives the same mesh topology (every link is equal anyway).
    """
    devices = list(devices if devices is not None else jax.devices())
    if len(devices) % n_slices:
        raise ValueError(
            f"{len(devices)} devices not divisible by n_slices={n_slices}"
        )
    per_slice = len(devices) // n_slices
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    if len(slice_ids) == n_slices and n_slices > 1:
        from jax.experimental import mesh_utils

        dev_array = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=devices
        )
    else:
        dev_array = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis=None, batch_dim: int = 0) -> NamedSharding:
    """Shard dim `batch_dim` over every mesh axis (pure DP on any mesh)."""
    if axis is None:
        axis = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*((None,) * batch_dim), axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh, axis=None, batch_dim=0):
    """Device-put every batch array with the batch dim sharded.

    `batch_dim=1` handles gradient-accumulation batches shaped
    (K_microbatches, B, ...): the microbatch dim stays unsharded (it is
    scanned over), B is split across the mesh.

    Rejects batches whose sharded dim is not divisible by the mesh's
    total device count — the TPU analogue of DDP's per-rank batch
    requirement (the reference drops ragged remainders via its sampler;
    the eval path here pads + masks instead, scripts/eval.py).
    """
    n = int(np.prod([mesh.shape[a] for a in (
        mesh.axis_names if axis is None
        else ((axis,) if isinstance(axis, str) else axis)
    )]))
    for k, x in batch.items():
        dim = getattr(x, "shape", ())[batch_dim] if (
            len(getattr(x, "shape", ())) > batch_dim) else None
        if dim is not None and dim % n:
            raise ValueError(
                f"batch[{k!r}] dim {batch_dim} = {dim} not divisible by "
                f"the mesh's {n} devices — pad the batch or drop the "
                "remainder (uneven per-device batches are not supported)"
            )
    sharding = batch_sharding(mesh, axis, batch_dim)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
