"""CRP (context relation prior) bottleneck module.

Reference: occdepth/models/CRP3D.py:9-97.  The relation bmm is expressed as
an einsum over (B, N, M) x (B, M, C) — a straight MXU matmul in bf16.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from occdepth_tpu.models.layers import BatchNorm, torch_conv
from occdepth_tpu.models.unet3d_blocks import ASPP3D, Process


class CPMegaVoxels(nn.Module):
    """Context-prior mega-voxel relations at the UNet3D bottleneck."""

    feature: int
    size: Tuple[int, int, int]
    n_relations: int = 4
    bn_momentum: float = 0.0003
    use_pallas: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool) -> Dict[str, jnp.ndarray]:
        B = x.shape[0]
        f = self.feature
        ctx_f = f * 2
        X, Y, Z = self.size
        flat = X * Y * Z
        flat_ctx = (X // 2) * (Y // 2) * (Z // 2)
        # stride-2 "mega context" conv; reference pads ((size+1) % 2) per dim
        # so odd dims still halve exactly (CRP3D.py:19-25)
        pad = tuple((((s + 1) % 2), ((s + 1) % 2)) for s in self.size)

        x_agg = ASPP3D(f, (1, 2, 3), bn_momentum=0.1, dtype=self.dtype,
                       name="aspp")(x, train)

        from occdepth_tpu.ops.conv3d_fast import Conv3DFast

        mega_raw = Conv3DFast(
            ctx_f, (3, 3, 3), strides=(2, 2, 2), padding=pad,
            dtype=self.dtype, param_dtype=jnp.float32, name="mega_context",
        )(x_agg)
        mega = mega_raw.reshape(B, -1, ctx_f)  # (B, M, ctx_f)

        p_logits = []
        rels = []
        for r in range(self.n_relations):
            logit = torch_conv(
                flat_ctx, (1, 1, 1), padding=(0, 0, 0), dtype=self.dtype,
                name=f"context_prior_logits_{r}",
            )(x_agg)  # (B, X, Y, Z, M)
            logit = logit.reshape(B, flat, flat_ctx)  # (B, N, M)
            p_logits.append(logit)
            if self.use_pallas:
                from occdepth_tpu.ops.pallas_kernels import (
                    crp_relation_matmul,
                )

                rel = jnp.stack([
                    crp_relation_matmul(logit[b], mega[b]) for b in range(B)
                ]).astype(mega.dtype)
            else:
                prior = nn.sigmoid(
                    logit.astype(jnp.float32)
                ).astype(mega.dtype)
                rel = jnp.einsum(
                    "bnm,bmc->bnc", prior, mega,
                    preferred_element_type=jnp.float32,
                ).astype(mega.dtype)
            rels.append(rel)

        x_context = jnp.concatenate(rels, axis=-1).reshape(
            B, X, Y, Z, ctx_f * self.n_relations
        )
        h = jnp.concatenate([x, x_context], axis=-1)
        h = torch_conv(f, (1, 1, 1), padding=(0, 0, 0), use_bias=False,
                       dtype=self.dtype, name="resize_conv")(h)
        h = Process(f, dilations=(1,), bn_momentum=self.bn_momentum,
                    dtype=self.dtype, name="resize_process")(h, train)

        # P_logits layout matches reference (B, n_rel, M, N) for the loss
        # (CRP3D.py:72-75 reshapes to (bs, flat_ctx, flat)).
        P = jnp.stack([p.transpose(0, 2, 1) for p in p_logits], axis=1)
        return {"x": h, "P_logits": P}
