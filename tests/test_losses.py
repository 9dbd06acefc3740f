"""Losses vs torch oracles implementing the reference formulas."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from occdepth_tpu.losses import (
    ce_ssc_loss,
    depth_cls_loss,
    frustum_proportion_loss,
    geo_scal_loss,
    relation_loss,
    sem_scal_loss,
)


def _rand_logits(rng, B=2, X=6, Y=4, Z=4, C=5):
    logits = rng.randn(B, X, Y, Z, C).astype(np.float32)
    target = rng.choice(
        [0, 1, 2, 3, 4, 255], size=(B, X, Y, Z), p=[0.4, 0.15, 0.15, 0.1, 0.1, 0.1]
    ).astype(np.int32)
    return logits, target


def test_ce_ssc_loss_matches_torch(rng):
    logits, target = _rand_logits(rng)
    w = rng.uniform(0.1, 3.0, size=5).astype(np.float32)
    out = float(ce_ssc_loss(jnp.asarray(logits), jnp.asarray(target),
                            jnp.asarray(w)))
    ref = F.cross_entropy(
        torch.from_numpy(logits).permute(0, 4, 1, 2, 3),
        torch.from_numpy(target).long(),
        weight=torch.from_numpy(w), ignore_index=255, reduction="mean",
    ).item()
    assert abs(out - ref) < 1e-5


def test_geo_scal_loss_matches_torch(rng):
    logits, target = _rand_logits(rng)
    out = float(geo_scal_loss(jnp.asarray(logits), jnp.asarray(target)))

    pred = F.softmax(torch.from_numpy(logits).permute(0, 4, 1, 2, 3), dim=1)
    empty = pred[:, 0]
    nonempty = 1 - empty
    t = torch.from_numpy(target)
    mask = t != 255
    tn = (t != 0)[mask].float()
    npr = nonempty[mask]
    epr = empty[mask]
    inter = (tn * npr).sum()
    precision = inter / npr.sum()
    recall = inter / tn.sum()
    spec = ((1 - tn) * epr).sum() / (1 - tn).sum()
    ref = (
        F.binary_cross_entropy(precision, torch.ones_like(precision))
        + F.binary_cross_entropy(recall, torch.ones_like(recall))
        + F.binary_cross_entropy(spec, torch.ones_like(spec))
    ).item()
    assert abs(out - ref) < 3e-4  # fp32 reduction-order noise


def test_sem_scal_loss_matches_torch(rng):
    logits, target = _rand_logits(rng)
    # drop one class entirely to exercise the has_class guard
    target[target == 3] = 2
    out = float(sem_scal_loss(jnp.asarray(logits), jnp.asarray(target)))

    pred = F.softmax(torch.from_numpy(logits).permute(0, 4, 1, 2, 3), dim=1)
    t = torch.from_numpy(target)
    mask = t != 255
    loss = 0.0
    count = 0
    for i in range(5):
        p = pred[:, i][mask]
        tm = t[mask]
        ct = (tm == i).float()
        if ct.sum() > 0:
            count += 1
            nom = (p * ct).sum()
            lc = 0.0
            if p.sum() > 0:
                lc = lc + F.binary_cross_entropy(
                    nom / p.sum(), torch.ones(()))
            if ct.sum() > 0:
                lc = lc + F.binary_cross_entropy(
                    nom / ct.sum(), torch.ones(()))
            if (1 - ct).sum() > 0:
                spec = ((1 - p) * (1 - ct)).sum() / (1 - ct).sum()
                lc = lc + F.binary_cross_entropy(spec, torch.ones(()))
            loss = loss + lc
    ref = (loss / count).item()
    assert abs(out - ref) < 1e-4


def test_frustum_proportion_loss_matches_torch(rng):
    B, X, Y, Z, C, Fr = 2, 6, 4, 4, 5, 4
    logits, target = _rand_logits(rng)
    masks = rng.rand(B, Fr, X, Y, Z) > 0.5
    # one empty frustum to exercise the nonempty guard
    masks[:, 1] = False
    dists = rng.randint(0, 10, size=(B, Fr, C)).astype(np.float32)
    dists[:, 1] = 0.0
    out = float(frustum_proportion_loss(
        jnp.asarray(logits), jnp.asarray(masks), jnp.asarray(dists)))

    pred_prob = F.softmax(torch.from_numpy(logits).permute(0, 4, 1, 2, 3), 1)
    fm = torch.from_numpy(masks)
    fcd = torch.from_numpy(dists)
    batch_cnt = fcd.sum(0)
    frustum_loss = 0.0
    frustum_nonempty = 0
    for fr in range(Fr):
        fmask = fm[:, fr].unsqueeze(1).float()
        prob = (fmask * pred_prob).reshape(B, C, -1).permute(1, 0, 2).reshape(C, -1)
        cum_prob = prob.sum(dim=1)
        total_cnt = batch_cnt[fr].sum()
        total_prob = prob.sum()
        if total_prob > 0 and total_cnt > 0:
            tp = batch_cnt[fr] / total_cnt
            cp = cum_prob / total_prob
            nz = tp != 0
            kl = F.kl_div(torch.log(cp[nz]), tp[nz], reduction="sum")
            frustum_loss += kl
            frustum_nonempty += 1
    ref = (frustum_loss / frustum_nonempty).item()
    assert abs(out - ref) < 1e-4


def test_relation_loss_matches_torch(rng):
    B, R, N, M = 2, 4, 16, 8
    logits = rng.randn(B, R, M, N).astype(np.float32)
    labels = (rng.rand(B, R, N, M) > 0.7).astype(np.uint8)
    out = float(relation_loss(jnp.asarray(logits), jnp.asarray(labels)))

    tl = torch.from_numpy(logits)
    lab = torch.from_numpy(labels)
    logit_list, label_list = [], []
    for i in range(B):
        logit_list.append(tl[i].permute(0, 2, 1).reshape(R, -1))
        label_list.append(lab[i].reshape(R, -1))
    lg = torch.cat(logit_list, dim=1).T
    lb = torch.cat(label_list, dim=1).T
    cnt_neg = (lb == 0).sum(0)
    cnt_pos = lb.sum(0)
    pw = cnt_neg / cnt_pos
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=pw)(lg, lb.float()).item()
    assert abs(out - ref) < 1e-5


def test_depth_cls_loss_matches_torch(rng):
    # KITTI-like mini setup: downsample 4, depth bins 8
    d_bound = (2.0, 10.0, 1.0)
    ds = 4
    B, n_cam, H, W = 1, 2, 17, 23
    h, w = 4, 5
    D = 8
    depth = rng.uniform(0, 12, size=(B, n_cam, H, W)).astype(np.float32)
    depth[depth < 0.5] = 0.0
    preds = rng.rand(B, n_cam, h, w, D).astype(np.float32)
    preds = preds / preds.sum(-1, keepdims=True)
    out = float(depth_cls_loss(jnp.asarray(depth), jnp.asarray(preds), ds,
                               d_bound))

    # torch oracle (depth_loss.py:14-87)
    dl = torch.from_numpy(depth).reshape(B * n_cam, H, W)
    dl = F.interpolate(dl.unsqueeze(1), (h * ds, w * ds), mode="nearest")
    g = dl.view(B * n_cam, h, ds, w, ds, 1)
    g = g.permute(0, 1, 3, 5, 2, 4).contiguous().view(-1, ds * ds)
    g = torch.where(g == 0.0, 1e5 * torch.ones_like(g), g)
    g = torch.min(g, dim=-1).values
    g = (g - (d_bound[0] - d_bound[2])) / d_bound[2]
    g = torch.where((g < D + 1) & (g >= 0.0), g, torch.zeros_like(g))
    g = F.one_hot(g.long(), num_classes=D + 1).view(-1, D + 1)[:, 1:].float()
    dp = torch.from_numpy(preds).reshape(B * n_cam, h, w, D).reshape(-1, D)
    fg = torch.max(g, dim=1).values > 0.0
    ref = (F.binary_cross_entropy(dp[fg], g[fg], reduction="none").sum()
           / max(1.0, fg.sum())).item()
    assert abs(out - ref) < 1e-4


def test_metrics_match_numpy_loop(rng):
    from occdepth_tpu.losses import SSCMetrics

    n_cl = 4
    m = SSCMetrics(n_cl)
    for _ in range(3):
        pred = rng.randint(0, n_cl, size=(2, 5, 5, 3))
        true = rng.choice([0, 1, 2, 3, 255], size=(2, 5, 5, 3))
        m.add_batch(pred, true)
    # oracle accumulation (sscMetrics.py:131-204)
    stats = m.get_stats()
    assert 0 <= stats["iou"] <= 1
    assert stats["iou_ssc"].shape == (n_cl,)

    # deterministic check on a hand case
    m2 = SSCMetrics(3)
    pred = np.array([[[[1, 0, 2]]]])
    true = np.array([[[[1, 255, 0]]]])
    m2.add_batch(pred, true)
    s = m2.get_stats()
    # 255 voxel -> (0,0): tp class 0. pred 2 vs true 0: fp cls2/fn cls0...
    assert s["precision"] == 0.5  # binarized: pred nonempty {1,2}, true {1}
    assert s["recall"] == 1.0
    assert s["iou"] == 0.5


def test_loss_grads_finite_at_prob_underflow():
    """Backward NaN regression (found driving train.py on real-scale data):
    clamped logs must have finite gradients when probabilities underflow to
    exact fp32 zero (softmax over 104 bins does this routinely)."""
    import jax

    from occdepth_tpu.losses.depth import depth_cls_loss
    from occdepth_tpu.losses.ssc import geo_scal_loss, sem_scal_loss

    # logits extreme enough that softmax == exact 0/1 in fp32
    logits = jnp.zeros((1, 4, 4, 2, 5), jnp.float32).at[..., 0].set(200.0)
    target = jnp.asarray(
        np.random.RandomState(0).randint(0, 5, size=(1, 4, 4, 2))
    )

    for fn in (sem_scal_loss, geo_scal_loss):
        val, grad = jax.value_and_grad(fn)(logits, target)
        assert np.isfinite(float(val)), fn.__name__
        assert np.isfinite(np.asarray(grad)).all(), fn.__name__

    # depth distillation: predicted distribution with exact zeros
    depth_logits = jnp.zeros((1, 1, 2, 3, 6), jnp.float32).at[..., 0].set(200.0)
    gt = jnp.full((1, 1, 8, 12), 3.0, jnp.float32)

    def loss_fn(dl):
        return depth_cls_loss(gt, jax.nn.softmax(dl, -1), 4, (2.0, 5.0, 0.5))

    val, grad = jax.value_and_grad(loss_fn)(depth_logits)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
