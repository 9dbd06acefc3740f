"""Pallas TPU kernels for the hot fused ops.

Two kernels where hand-fusion beats XLA's default lowering:

* `crp_relation_matmul` — the CRP "bmm" (reference CRP3D.py:77-81):
  computes sigmoid(P_logit) @ mega_context with the sigmoid fused into the
  MXU matmul's LHS load, so the (N, M) probability matrix is never
  materialized in HBM (N=4096, M=512 per relation on KITTI).

* `stereo_cosine_fuse` — the Stereo-SFA cross-view weighting (reference
  SFA.py:46-88) for the 2-view case: one VPU pass over the (N, C) per-view
  voxel features computes the cosine weights and the fused output without
  intermediate (N,) arrays round-tripping through HBM.

Both have jnp reference implementations (`*_reference`) used as fallbacks
on non-TPU backends and as test oracles (interpret mode runs on CPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def pallas_enabled(cfg) -> bool:
    """Kernels run only when requested AND a TPU backend is active."""
    return bool(getattr(cfg, "use_pallas", False)) and _on_tpu()


# ---------------------------------------------------------------------------
# CRP fused sigmoid-matmul
# ---------------------------------------------------------------------------

def crp_relation_matmul_reference(p_logit: jnp.ndarray,
                                  mega: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(p_logit) @ mega.  p_logit (N, M), mega (M, C) -> (N, C)."""
    prior = jax.nn.sigmoid(p_logit.astype(jnp.float32))
    return jnp.dot(
        prior, mega.astype(jnp.float32), preferred_element_type=jnp.float32
    )


def _crp_kernel(p_ref, mega_ref, out_ref):
    prior = jax.nn.sigmoid(p_ref[:].astype(jnp.float32))
    out_ref[:] = jnp.dot(
        prior, mega_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def crp_relation_matmul(
    p_logit: jnp.ndarray, mega: jnp.ndarray, block_n: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused sigmoid + matmul over N tiles (M, C stay resident in VMEM)."""
    N, M = p_logit.shape
    M2, C = mega.shape
    assert M == M2, (p_logit.shape, mega.shape)
    if N % block_n != 0:
        return crp_relation_matmul_reference(p_logit, mega)

    grid = (N // block_n,)
    return pl.pallas_call(
        _crp_kernel,
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_n, M), lambda i: (i, 0),
                         memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec((M, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p_logit, mega)


# ---------------------------------------------------------------------------
# Stereo-SFA cosine fusion (2 views)
# ---------------------------------------------------------------------------

def stereo_cosine_fuse_reference(
    f0: jnp.ndarray, f1: jnp.ndarray, m0: jnp.ndarray, m1: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    """Reference 2-view fusion: (N, C) x2 + (N,) masks -> (N, C)."""
    n0 = jnp.maximum(jnp.linalg.norm(f0, axis=-1), eps)
    n1 = jnp.maximum(jnp.linalg.norm(f1, axis=-1), eps)
    cos = (f0 * f1).sum(-1) / (n0 * n1) * (m0 * m1)
    w0 = cos + (m0 - m1 > 0)
    w1 = cos + (m1 - m0 > 0)
    return (w0[:, None] * f0 + w1[:, None] * f1) * 0.5


def _fuse_kernel(f0_ref, f1_ref, m0_ref, m1_ref, out_ref, *, eps):
    f0 = f0_ref[:].astype(jnp.float32)
    f1 = f1_ref[:].astype(jnp.float32)
    m0 = m0_ref[:].astype(jnp.float32)
    m1 = m1_ref[:].astype(jnp.float32)
    n0 = jnp.maximum(jnp.sqrt((f0 * f0).sum(-1, keepdims=True)), eps)
    n1 = jnp.maximum(jnp.sqrt((f1 * f1).sum(-1, keepdims=True)), eps)
    cos = (f0 * f1).sum(-1, keepdims=True) / (n0 * n1) * (m0 * m1)
    w0 = cos + (m0 - m1 > 0).astype(jnp.float32)
    w1 = cos + (m1 - m0 > 0).astype(jnp.float32)
    out_ref[:] = (w0 * f0 + w1 * f1) * 0.5


def stereo_cosine_fuse(
    f0: jnp.ndarray, f1: jnp.ndarray, m0: jnp.ndarray, m1: jnp.ndarray,
    eps: float = 1e-8, block_n: int = 2048, interpret: bool = False,
) -> jnp.ndarray:
    """Fused 2-view cosine weighting over N tiles.  Masks passed (N, 1)."""
    N, C = f0.shape
    if N % block_n != 0:
        return stereo_cosine_fuse_reference(f0, f1, m0, m1, eps)
    m0 = m0.reshape(N, 1)
    m1 = m1.reshape(N, 1)
    grid = (N // block_n,)
    vec = lambda: pl.BlockSpec((block_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    msk = lambda: pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fuse_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct((N, C), jnp.float32),
        grid=grid,
        in_specs=[vec(), vec(), msk(), msk()],
        out_specs=vec(),
        interpret=interpret,
    )(f0, f1, m0, m1)
