"""Whole-network numeric parity vs the composed torch oracle.

This is the end-to-end converter/parity tripwire the VERDICT asked for: a
full reference-semantics torch OccDepth (tests/torch_oracle.py) is randomly
initialized, its state_dict is run through `convert_state_dict` (the same
path a released .ckpt takes), and the flax model must reproduce the logits.
Any layout, quirk, or converter error anywhere in the network fails this.

Also covers the two module parities that were missing: DepthNet
(flosp_depth.py:201-257) and the frustum grid generator vs the kornia math
(frustum_grid_generator.py:32-152), including a flip ida_mat.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.testing import tiny_kitti_config
from occdepth_tpu.training.convert_torch import (
    _Mapper,
    _map_flosp_depth,
    _nest,
    convert_state_dict,
)
from tests.torch_oracle import (
    TorchDepthNet,
    TorchFrustumGridGenerator,
    TorchOccDepth,
    randomize_bn,
)


def test_depth_net_parity(rng):
    """DepthNet through the converter (missing parity per VERDICT #2)."""
    from occdepth_tpu.models.flosp_depth import DepthNet

    torch.manual_seed(5)
    mid, depth_ch = 8, 6
    tmod = TorchDepthNet(8, mid, depth_ch).eval()
    randomize_bn(tmod, seed=5)

    feat = torch.randn(2, 8, 5, 7)
    cam_k = torch.tensor(
        [[[120.0, 0, 48], [0, 118.0, 32], [0, 0, 1]],
         [[95.0, 0, 40], [0, 99.0, 30], [0, 0, 1]]]
    )
    intrins = torch.zeros(2, 1, 4, 4)
    intrins[:, 0, :3, :3] = cam_k
    intrins[:, 0, 3, 3] = 1
    ref = tmod(feat, intrins).detach().numpy()

    sd = {
        "flosp_depth.depth_net.0." + k: v.detach().numpy()
        for k, v in tmod.state_dict().items()
    }
    m = _Mapper(sd)
    _map_flosp_depth(m, None)
    assert not m.missing, m.missing[:8]
    params = _nest(m.params)["flosp_depth"]["depth_net"]
    stats = _nest(m.stats)["flosp_depth"]["depth_net"]

    inv = np.linalg.inv(cam_k.numpy())
    sps = np.sqrt(inv[:, 0, 0] ** 2 + inv[:, 1, 1] ** 2).reshape(2, 1) * 1000.0

    fmod = DepthNet(mid, depth_ch)
    out = fmod.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(feat.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(sps.astype(np.float32)),
        False,
    )
    np.testing.assert_allclose(
        np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
    )


@pytest.mark.parametrize("flip", [False, True])
def test_frustum_grid_parity(flip):
    """frustum_grid vs the kornia-semantics oracle, incl. flip ida_mats."""
    from occdepth_tpu.geometry.frustum import FrustumGridSpec, frustum_grid

    H, W = 48, 72
    spec = FrustumGridSpec(
        grid_size=(10, 8, 6),
        pc_range=(0.0, -3.2, -1.6, 6.4, 3.2, 1.6),
        num_bins=12,
        depth_min=2.0,
        depth_max=10.0,
        mode="LID",
        final_dim=(H, W),
    )
    lidar_to_cam = np.eye(4, dtype=np.float32)
    lidar_to_cam[:3, :3] = np.array(
        [[0, -1, 0], [0, 0, -1], [1, 0, 0]], np.float32
    )
    lidar_to_cam[:3, 3] = [0.05, 0.8, -0.3]
    cam_k = np.array([[60.0, 0, 36], [0, 58.0, 24], [0, 0, 1]], np.float32)
    cam_to_img = np.concatenate([cam_k, np.zeros((3, 1), np.float32)], 1)
    if flip:
        # reference fliplr ida: x' = (W-1) - x (kitti_dataset.py:384-412)
        ida = np.array(
            [[-1, 0, 0, W - 1], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            np.float32,
        )
    else:
        ida = np.eye(4, dtype=np.float32)

    ours = np.asarray(
        frustum_grid(spec, jnp.asarray(lidar_to_cam), jnp.asarray(cam_to_img),
                     jnp.asarray(ida))
    )

    gen = TorchFrustumGridGenerator(
        spec.grid_size,
        list(spec.pc_range),
        {"mode": "LID", "num_bins": 12, "depth_min": 2.0, "depth_max": 10.0},
        (H, W),
    )
    ref = gen(
        torch.from_numpy(lidar_to_cam)[None],
        torch.from_numpy(cam_to_img)[None],
        torch.from_numpy(ida)[None],
    )[0].numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-4)


@pytest.fixture(scope="module")
def full_parity_setup():
    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=11)

    torch.manual_seed(9)
    oracle = TorchOccDepth(cfg).eval()
    randomize_bn(oracle, seed=9)

    t = lambda x: torch.from_numpy(np.asarray(x))
    with torch.no_grad():
        ref = oracle(
            t(batch["img"]).permute(0, 1, 4, 2, 3).contiguous(),
            t(batch["projected_pix"]).long(),
            t(batch["fov_mask"]),
            t(batch["cam_k"]),
            t(batch["T_velo_2_cam"]),
            t(batch["ida_mats"]),
        )

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params, stats, missing = convert_state_dict(sd, cfg)
    assert not missing, missing[:10]

    model = OccDepthModel(cfg=cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    return ref, out


def test_full_model_ssc_logit_parity(full_parity_setup):
    ref, out = full_parity_setup
    np.testing.assert_allclose(
        np.asarray(out["ssc_logit"]).transpose(0, 4, 1, 2, 3),
        ref["ssc_logit"].numpy(),
        atol=3e-3,
    )


def test_full_model_occ_logit_parity(full_parity_setup):
    ref, out = full_parity_setup
    np.testing.assert_allclose(
        np.asarray(out["occ_logit"]).transpose(0, 4, 1, 2, 3),
        ref["occ_logit"].numpy(),
        atol=3e-3,
    )


def test_full_model_p_logits_parity(full_parity_setup):
    ref, out = full_parity_setup
    np.testing.assert_allclose(
        np.asarray(out["P_logits"]), ref["P_logits"].numpy(), atol=3e-3
    )


def test_full_model_depth_pred_parity(full_parity_setup):
    ref, out = full_parity_setup
    np.testing.assert_allclose(
        np.asarray(out["depth_pred"]).transpose(0, 1, 4, 2, 3),
        ref["depth_pred"].numpy(),
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# NYU virtual-stereo path (the second released-checkpoint config)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nyu_parity_setup():
    from occdepth_tpu.testing import tiny_nyu_config
    from tests.torch_oracle import TorchOccDepthNYU

    cfg = tiny_nyu_config()
    batch = make_synthetic_batch(cfg, batch_size=2, seed=21)

    torch.manual_seed(13)
    oracle = TorchOccDepthNYU(cfg).eval()
    randomize_bn(oracle, seed=13)

    t = lambda x: torch.from_numpy(np.asarray(x))
    with torch.no_grad():
        ref = oracle(
            t(batch["img"]).permute(0, 1, 4, 2, 3).contiguous(),
            t(batch["projected_pix"]).long(),
            t(batch["fov_mask"]),
            t(batch["gt_depth"]),
            float(np.asarray(batch["virtual_bf"]).reshape(-1)[0]),
        )

    sd = {k: v.numpy() for k, v in oracle.state_dict().items()}
    params, stats, missing = convert_state_dict(sd, cfg)
    assert not missing, missing[:10]

    model = OccDepthModel(cfg=cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    return ref, out


def test_nyu_full_model_ssc_logit_parity(nyu_parity_setup):
    """End-to-end NYU logits: backbone -> virtual-stereo warp -> Stereo-SFA
    (NYU axis permute) -> UNet3D-NYU + CRP + cascade, through the converter."""
    ref, out = nyu_parity_setup
    got = np.asarray(out["ssc_logit"]).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref["ssc_logit"].numpy(), atol=2e-3)


def test_nyu_full_model_occ_logit_parity(nyu_parity_setup):
    ref, out = nyu_parity_setup
    got = np.asarray(out["occ_logit"]).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, ref["occ_logit"].numpy(), atol=2e-3)


def test_nyu_full_model_p_logits_parity(nyu_parity_setup):
    ref, out = nyu_parity_setup
    np.testing.assert_allclose(
        np.asarray(out["P_logits"]), ref["P_logits"].numpy(), atol=2e-3
    )
