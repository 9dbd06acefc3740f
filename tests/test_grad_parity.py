"""Gradient parity vs torch autograd through the checkpoint converter.

Forward parity (test_full_model_parity) proves the values; this proves the
BACKWARD: d(loss)/d(params) of the full tiny-flagship network (stereo +
flosp_depth + CRP + cascade) in train mode must match torch autograd on
the reference-semantics oracle — pinning stop_gradient placement
(share_2d_backbone_gradient, reference OccDepth.py:213-216), train-mode
BatchNorm batch statistics, and every layout transform in the converter
(conv-kernel transposes apply identically to gradients, so the torch
.grad tensors can be run through convert_state_dict and compared leaf
for leaf in the flax tree).

Tolerances are noise-aware: this network's gradients reach ~5e5 through
~40 tiny-batch BatchNorm layers, and fp32 autograd carries a few percent
of conditioning noise — torch's own fp32 gradients deviate from its
float64 gradients by that much.  So the oracle runs twice (float64 =
ground truth, float32 = the noise yardstick) and each flax-f32 leaf must
sit within a small multiple of torch's own f32 self-noise.  Measured at
this seed: 2 of 644 leaves exceed 3x, none exceed ~4.1x.

The loss is a fixed random cotangent applied to every output head
(ssc/occ/P_logits/depth_pred) — loss-function parity itself is covered
by tests/test_losses.py.
"""
import numpy as np
import pytest
import torch

import jax

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.convert_torch import convert_state_dict

from tests.torch_oracle import TorchOccDepth, randomize_bn

# flax (channels-last) -> torch layout axis orders per head
HEAD_TRANSPOSE = {
    "ssc_logit": (0, 4, 1, 2, 3),
    "occ_logit": (0, 4, 1, 2, 3),
    "P_logits": None,  # identical layouts
    "depth_pred": (0, 1, 4, 2, 3),
}


def _torch_loss_and_grads(cfg, batch, double: bool):
    torch.manual_seed(17)
    oracle = TorchOccDepth(cfg).train()
    randomize_bn(oracle, seed=17)
    if double:
        oracle = oracle.double()
        for m in oracle.modules():  # non-buffer tensor attrs (grid consts)
            for name, val in list(vars(m).items()):
                if isinstance(val, torch.Tensor) and val.dtype == torch.float32:
                    setattr(m, name, val.double())
    dt = torch.float64 if double else torch.float32
    t = lambda x: torch.from_numpy(np.asarray(x))
    f = lambda x: torch.from_numpy(np.asarray(x)).to(dt)
    out = oracle(
        f(batch["img"]).permute(0, 1, 4, 2, 3).contiguous(),
        t(batch["projected_pix"]).long(),
        t(batch["fov_mask"]),
        f(batch["cam_k"]),
        f(batch["T_velo_2_cam"]),
        f(batch["ida_mats"]),
    )
    rs = np.random.RandomState(3)
    cots = {
        k: rs.randn(*out[k].shape).astype(np.float32)
        for k in HEAD_TRANSPOSE
        if k in out
    }
    loss = sum(
        (out[k] * torch.from_numpy(c).to(dt)).sum() for k, c in cots.items()
    )
    loss.backward()
    pn = dict(oracle.named_parameters())
    sd_vals = {
        k: v.detach().to(torch.float64).numpy()
        for k, v in oracle.state_dict().items()
    }
    sd_grads = {
        k: (
            pn[k].grad.detach().to(torch.float64).numpy()
            if k in pn and pn[k].grad is not None
            else np.zeros(v.shape)
        )
        for k, v in oracle.state_dict().items()
    }
    return float(loss.item()), sd_vals, sd_grads, cots


@pytest.fixture(scope="module")
def grad_setup():
    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=13)

    loss64, sd64, g64_sd, cots = _torch_loss_and_grads(cfg, batch, True)
    loss32, _, g32_sd, _ = _torch_loss_and_grads(cfg, batch, False)

    # the GRADIENTS ride through the same converter the weights use:
    # every mapping is a reshape/transpose, which commutes with d/dw
    params, stats, missing = convert_state_dict(
        {k: v.astype(np.float32) for k, v in sd64.items()}, cfg
    )
    assert not missing, missing[:10]
    g64, _, _ = convert_state_dict(g64_sd, cfg)
    g32, _, _ = convert_state_dict(g32_sd, cfg)

    model = OccDepthModel(cfg=cfg)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=True,
            mutable=["batch_stats"],
        )
        total = 0.0
        for k, c in cots.items():
            o = out[k]
            tr = HEAD_TRANSPOSE[k]
            if tr is not None:
                o = o.transpose(tr)
            total = total + (o * c).sum()
        return total

    loss_j, grads_j = jax.value_and_grad(loss_fn)(params)
    return loss64, loss32, float(loss_j), g64, g32, grads_j


def test_loss_scalar_matches(grad_setup):
    loss64, loss32, loss_j, *_ = grad_setup
    # flax-f32's deviation from the f64 truth bounded by a multiple of
    # torch-f32's own deviation
    torch_noise = abs(loss32 - loss64)
    assert abs(loss_j - loss64) < 4.0 * torch_noise + 1e-3 * abs(loss64)


def test_gradients_match_torch_autograd(grad_setup):
    _, _, _, g64, g32, grads_j = grad_setup
    triples = zip(
        jax.tree_util.tree_leaves_with_path(g64),
        jax.tree_util.tree_leaves_with_path(g32),
        jax.tree_util.tree_leaves_with_path(grads_j),
    )
    n = 0
    bad = []
    for (path, r64), (p32, r32), (pj, gj) in triples:
        assert jax.tree_util.keystr(path) == jax.tree_util.keystr(pj)
        r64 = np.asarray(r64)
        err_j = np.abs(np.asarray(gj, np.float64) - r64).max()
        err_t = np.abs(np.asarray(r32) - r64).max()  # torch's own f32 noise
        # allow 6x torch's own f32 self-noise plus 0.05% of the leaf's
        # gradient magnitude — a structural backward bug shows up at
        # ~100% of leaf scale, conditioning noise at far below this
        floor = 5e-4 * max(np.abs(r64).max(), 1.0) + 1e-3
        n += 1
        if err_j > 6.0 * err_t + floor:
            bad.append((jax.tree_util.keystr(path), float(err_j),
                        float(err_t)))
    assert n > 600  # the whole tree was compared
    assert not bad, sorted(bad, key=lambda x: -x[1])[:15]


def test_gradients_nonzero(grad_setup):
    *_, grads_j = grad_setup
    total = sum(
        float(np.abs(np.asarray(l)).sum())
        for l in jax.tree_util.tree_leaves(grads_j)
    )
    assert np.isfinite(total) and total > 0


# ---------------------------------------------------------------------------
# NYU virtual-stereo path: gradients flow THROUGH the disparity warp into
# the backbone (reference builds the virtual view outside the no_grad
# block, OccDepth.py:222-231), and sample 0's disparity broadcasts over
# the batch — both pinned here at batch_size 2.
# ---------------------------------------------------------------------------


def _torch_nyu_loss_and_grads(cfg, batch, double: bool):
    from tests.torch_oracle import TorchOccDepthNYU

    torch.manual_seed(23)
    oracle = TorchOccDepthNYU(cfg).train()
    randomize_bn(oracle, seed=23)
    if double:
        oracle = oracle.double()
        for m in oracle.modules():
            for name, val in list(vars(m).items()):
                if isinstance(val, torch.Tensor) and val.dtype == torch.float32:
                    setattr(m, name, val.double())
    dt = torch.float64 if double else torch.float32
    t = lambda x: torch.from_numpy(np.asarray(x))
    f = lambda x: torch.from_numpy(np.asarray(x)).to(dt)
    out = oracle(
        f(batch["img"]).permute(0, 1, 4, 2, 3).contiguous(),
        t(batch["projected_pix"]).long(),
        t(batch["fov_mask"]),
        f(batch["gt_depth"]),
        float(np.asarray(batch["virtual_bf"]).reshape(-1)[0]),
    )
    rs = np.random.RandomState(7)
    cots = {
        k: rs.randn(*out[k].shape).astype(np.float32)
        for k in ("ssc_logit", "occ_logit", "P_logits")
        if k in out
    }
    loss = sum(
        (out[k] * torch.from_numpy(c).to(dt)).sum() for k, c in cots.items()
    )
    loss.backward()
    pn = dict(oracle.named_parameters())
    sd_vals = {
        k: v.detach().to(torch.float64).numpy()
        for k, v in oracle.state_dict().items()
    }
    sd_grads = {
        k: (
            pn[k].grad.detach().to(torch.float64).numpy()
            if k in pn and pn[k].grad is not None
            else np.zeros(v.shape)
        )
        for k, v in oracle.state_dict().items()
    }
    return float(loss.item()), sd_vals, sd_grads, cots


def test_nyu_gradients_match_torch_autograd():
    from occdepth_tpu.testing import tiny_nyu_config

    cfg = tiny_nyu_config()
    batch = make_synthetic_batch(cfg, batch_size=2, seed=21)

    _, sd64, g64_sd, cots = _torch_nyu_loss_and_grads(cfg, batch, True)
    _, _, g32_sd, _ = _torch_nyu_loss_and_grads(cfg, batch, False)

    params, stats, missing = convert_state_dict(
        {k: v.astype(np.float32) for k, v in sd64.items()}, cfg
    )
    assert not missing, missing[:10]
    g64, _, _ = convert_state_dict(g64_sd, cfg)
    g32, _, _ = convert_state_dict(g32_sd, cfg)

    model = OccDepthModel(cfg=cfg)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, batch, train=True,
            mutable=["batch_stats"],
        )
        total = 0.0
        for k, c in cots.items():
            o = out[k]
            tr = HEAD_TRANSPOSE[k]
            if tr is not None:
                o = o.transpose(tr)
            total = total + (o * c).sum()
        return total

    grads_j = jax.grad(loss_fn)(params)
    bad = []
    n = 0
    for (path, r64), (_, r32), (_, gj) in zip(
        jax.tree_util.tree_leaves_with_path(g64),
        jax.tree_util.tree_leaves_with_path(g32),
        jax.tree_util.tree_leaves_with_path(grads_j),
    ):
        r64 = np.asarray(r64)
        err_j = np.abs(np.asarray(gj, np.float64) - r64).max()
        err_t = np.abs(np.asarray(r32) - r64).max()
        # allow 6x torch's own f32 self-noise plus 0.05% of the leaf's
        # gradient magnitude — a structural backward bug shows up at
        # ~100% of leaf scale, conditioning noise at far below this
        floor = 5e-4 * max(np.abs(r64).max(), 1.0) + 1e-3
        n += 1
        # 12x here (vs 6x for KITTI): XLA-CPU's reduction order gives the
        # flax grads a larger noise constant on this batch-2 config —
        # measured worst 7.3x with <=0.5% relative deviation, while a
        # structural backward bug registers at ~100% of leaf scale
        if err_j > 12.0 * err_t + floor:
            bad.append((jax.tree_util.keystr(path), float(err_j),
                        float(err_t)))
    assert n > 400
    assert not bad, sorted(bad, key=lambda x: -x[1])[:15]
