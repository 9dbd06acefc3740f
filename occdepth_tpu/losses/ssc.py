"""SSC losses as branch-free masked vector math.

Reference: occdepth/loss/ssc_loss.py.  The data-dependent guards
(`if torch.sum(...) > 0`) become `where` masks so everything jits; values
match the reference for every branch combination.

Layout: logits are (B, X, Y, Z, C) channels-last; targets (B, X, Y, Z) int
with 255 = invalid.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_LOG_CLAMP = 100.0  # torch F.binary_cross_entropy clamps log at -100
_TINY = 1e-37  # below this, 1/x overflows fp32 and the clamp is active


def _safe_neg_log(x: jnp.ndarray) -> jnp.ndarray:
    """-log(x) with torch's BCE clamp semantics AND a finite gradient.

    `min(-log(max(x, 0)), 100)` is forward-correct but its backward is
    `0 * inf = NaN` at x == 0 (the select multiplies the untaken branch's
    infinite dlog) — this poisoned every parameter upstream the first time
    a probability underflowed to exact 0 on real-scale data.  The
    double-where evaluates log only where it is safe; the gradient at the
    clamp is 0 (torch's is huge-but-finite there; after clip-by-35 both
    train the same).  For x in (3.7e-44, 1e-37) the forward returns the
    clamp (100) where torch returns 85..100 — a measure-zero divergence.
    """
    safe = x > _TINY
    return jnp.where(safe, -jnp.log(jnp.where(safe, x, 1.0)), _LOG_CLAMP)


def ce_ssc_loss(
    logits: jnp.ndarray, target: jnp.ndarray, class_weights: jnp.ndarray
) -> jnp.ndarray:
    """Class-weighted cross entropy, ignore_index 255, weighted mean.

    Matches torch nn.CrossEntropyLoss(weight, ignore_index=255, 'mean'):
    sum_i w[y_i]*nll_i / sum_i w[y_i] over valid voxels (ssc_loss.py:90-99).
    """
    valid = target != 255
    t = jnp.where(valid, target, 0).astype(jnp.int32)
    logp = _log_softmax(logits)
    # gather-free: take_along_axis over millions of 1-element rows (and
    # its scatter-add backward) hits the TPU gather cliff; a one-hot
    # multiply-reduce is pure VPU traffic and fuses into the softmax
    C = logits.shape[-1]
    onehot = (
        t[..., None] == jnp.arange(C, dtype=jnp.int32)
    ).astype(jnp.float32)
    nll = -(logp * onehot).sum(axis=-1)
    w = onehot @ class_weights.astype(jnp.float32)
    w = jnp.where(valid, w, 0.0)
    return (w * nll).sum() / jnp.maximum(w.sum(), 1e-12)


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    m = x.max(axis=-1, keepdims=True)
    s = x - m
    return s - jnp.log(jnp.exp(s).sum(axis=-1, keepdims=True))


def _softmax(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(_log_softmax(x))


def geo_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Binary-occupancy precision/recall/specificity BCE (ssc_loss.py:16-40)."""
    prob = _softmax(logits)
    empty = prob[..., 0]
    nonempty = 1.0 - empty

    valid = (target != 255).astype(jnp.float32)
    t_nonempty = ((target != 0) & (target != 255)).astype(jnp.float32)

    # degenerate denominators (all-empty predictions/targets) give the
    # clamp value with finite gradient instead of torch's NaN — identical
    # everywhere a real scene/model lands (see _safe_neg_log)
    def _ratio(num, den):
        pos = den > 0
        return jnp.where(pos, num / jnp.where(pos, den, 1.0), 0.0)

    inter = (t_nonempty * nonempty * valid).sum()
    precision = _ratio(inter, (nonempty * valid).sum())
    recall = _ratio(inter, t_nonempty.sum())
    spec_num = ((1.0 - t_nonempty) * empty * valid).sum()
    spec = _ratio(spec_num, ((1.0 - t_nonempty) * valid).sum())
    return _safe_neg_log(precision) + _safe_neg_log(recall) + _safe_neg_log(spec)


def sem_scal_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-class precision/recall/specificity BCE (ssc_loss.py:43-87).

    The reference's python loop over classes with data-dependent `if`s is
    replaced by vectorized per-class sums + `where` guards.
    """
    C = logits.shape[-1]
    prob = _softmax(logits)  # (..., C)
    valid = (target != 255).astype(jnp.float32)
    t = jnp.where(target == 255, 0, target).astype(jnp.int32)
    onehot = jax.nn.one_hot(t, C, dtype=jnp.float32) * valid[..., None]

    axes = tuple(range(target.ndim))
    p_sum = (prob * valid[..., None]).sum(axis=axes)  # (C,)
    ct_sum = onehot.sum(axis=axes)  # (C,) == sum(completion_target)
    nom = (prob * onehot).sum(axis=axes)  # (C,)
    not_ct_sum = valid.sum() - ct_sum  # sum(1 - completion_target) over valid
    spec_nom = ((1.0 - prob) * (valid[..., None] - onehot)).sum(axis=axes)

    # guard denominators with where, NOT maximum(x, eps): the derivative
    # -nom/eps^2 underflows to 0/0 = NaN in fp32 and the outer where cannot
    # stop 0*NaN (this poisoned training the first time a class had zero
    # predicted mass).  where(guard, x, 1) matches torch, which divides by
    # the raw sum under an `if sum > 0` guard (ssc_loss.py:64-86).
    has_class = ct_sum > 0
    p_pos = p_sum > 0
    nct_pos = not_ct_sum > 0
    loss_prec = jnp.where(
        p_pos, _safe_neg_log(nom / jnp.where(p_pos, p_sum, 1.0)), 0.0
    )
    loss_rec = jnp.where(
        has_class, _safe_neg_log(nom / jnp.where(has_class, ct_sum, 1.0)), 0.0
    )
    loss_spec = jnp.where(
        nct_pos,
        _safe_neg_log(spec_nom / jnp.where(nct_pos, not_ct_sum, 1.0)),
        0.0,
    )
    per_class = jnp.where(has_class, loss_prec + loss_rec + loss_spec, 0.0)
    count = has_class.astype(jnp.float32).sum()
    return per_class.sum() / jnp.maximum(count, 1.0)


def frustum_proportion_loss(
    logits: jnp.ndarray,
    frustums_masks: jnp.ndarray,  # (B, F, X, Y, Z) bool
    frustums_class_dists: jnp.ndarray,  # (B, F, C) float
) -> jnp.ndarray:
    """Per-local-frustum KL between predicted mass and GT class distribution.

    Reference: the frustum loop in OccDepth.step (OccDepth.py:490-524) +
    KL_sep (ssc_loss.py:6-13), vectorized over the F = frustum_size^2 tiles.
    """
    B = logits.shape[0]
    C = logits.shape[-1]
    prob = _softmax(logits).reshape(B, -1, C)  # (B, S, C)
    masks = frustums_masks.reshape(B, frustums_masks.shape[1], -1)  # (B, F, S)

    cum_prob = jnp.einsum(
        "bfs,bsc->fc", masks.astype(jnp.float32), prob,
        preferred_element_type=jnp.float32,
    )  # (F, C)
    batch_cnt = frustums_class_dists.sum(axis=0)  # (F, C)

    total_cnt = batch_cnt.sum(axis=1)  # (F,)
    total_prob = cum_prob.sum(axis=1)  # (F,)
    nonempty = (total_prob > 0) & (total_cnt > 0)

    target_prop = batch_cnt / jnp.maximum(total_cnt, 1e-30)[:, None]
    p = cum_prob / jnp.maximum(total_prob, 1e-30)[:, None]

    # KL over classes with nonzero target mass (KL_sep)
    tgt_nz = target_prop > 0
    kl_el = jnp.where(
        tgt_nz,
        target_prop * (jnp.log(jnp.maximum(target_prop, 1e-30)) -
                       jnp.log(jnp.maximum(p, 1e-30))),
        0.0,
    )
    kl = kl_el.sum(axis=1)  # (F,)
    kl = jnp.where(nonempty, kl, 0.0)
    n = nonempty.astype(jnp.float32).sum()
    return kl.sum() / jnp.maximum(n, 1.0)
