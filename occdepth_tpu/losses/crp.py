"""CRP relation loss (multi-label BCE-with-logits, per-relation pos_weight).

Reference: occdepth/loss/CRP_loss.py:4-24.
"""
from __future__ import annotations

import jax.numpy as jnp


def relation_loss(p_logits: jnp.ndarray, cp_mega: jnp.ndarray) -> jnp.ndarray:
    """BCEWithLogits between predicted relation logits and GT relations.

    Args:
        p_logits: (B, n_rel, M, N) predicted logits (model layout).
        cp_mega: (B, n_rel, N, M) GT relations in {0, 1}.

    pos_weight per relation = (#zeros / #ones) over the whole batch
    (CRP_loss.py:19-22); mean reduction over all elements.
    """
    n_rel = p_logits.shape[1]
    logits = p_logits.transpose(0, 1, 3, 2).reshape(
        p_logits.shape[0], n_rel, -1
    )  # (B, n_rel, N*M)
    labels = cp_mega.reshape(cp_mega.shape[0], n_rel, -1).astype(jnp.float32)

    # flatten batch into the element dim: (n_rel, B*N*M)
    logits = logits.transpose(1, 0, 2).reshape(n_rel, -1).astype(jnp.float32)
    labels = labels.transpose(1, 0, 2).reshape(n_rel, -1)

    cnt_pos = labels.sum(axis=1)
    cnt_neg = (labels == 0).sum(axis=1).astype(jnp.float32)
    pos_weight = cnt_neg / jnp.maximum(cnt_pos, 1e-12)

    # stable BCE-with-logits with pos_weight (torch formulation):
    # l = (1-y)*x + (1 + (pw-1)*y) * log(1 + exp(-x))  [with max trick]
    x = logits
    y = labels
    log_weight = 1.0 + (pos_weight[:, None] - 1.0) * y
    loss = (1.0 - y) * x + log_weight * (
        jnp.log1p(jnp.exp(-jnp.abs(x))) + jnp.maximum(-x, 0.0)
    )
    return loss.mean()
