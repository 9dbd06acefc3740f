"""FULL-RESOLUTION whole-network parity vs the torch oracle (VERDICT r2 #2).

Every other parity test runs at tiny shapes (testing.TINY_IMG_KITTI 64x96);
this one pushes ONE frame at the released-checkpoint resolutions through
both stacks on CPU and asserts the logits agree:

  * KITTI flagship (multicam_flospdepth_crp_stereodepth_cascadecls_2080ti:
    370x1220 stereo -> 256x256x32, b3, feature 32) — reference forward
    OccDepth.py:344-376;
  * NYU virtual-stereo (multicam_flosp_crp_stereodepth_cascadecls_2080ti:
    480x640 RGB-D -> 60x36x60, b4, feature 100, flosp).

This is the strongest released-checkpoint proxy obtainable while datasets
and .ckpt files cannot reach this box: the same convert_state_dict path a
real checkpoint takes, at the real shapes, including every resize/padding
quirk that tiny shapes could mask (TF-SAME at odd sizes, align_corners
resizes at 370->92->46 vs 64->16, full-grid frustum geometry).

Slow (~0.5-1 h on a 1-core host, CPU-only) -> @pytest.mark.slow.  Each run
also digests the flax outputs against a committed golden fixture
(tests/golden/fullres_*.npz) so numeric drift is caught even when the
oracle half is skipped.  Regenerate deliberately:
    python -m tests.test_fullres_parity [kitti|nyu]
"""
import os

import numpy as np
import pytest
import torch

from occdepth_tpu.config import FlospDepthConfig, OccDepthConfig
from occdepth_tpu.data.batch import make_synthetic_batch
from occdepth_tpu.models import OccDepthModel
from occdepth_tpu.training.convert_torch import convert_state_dict

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
N_PROBE = 2048


def fullres_kitti_config() -> OccDepthConfig:
    """The flagship 2080ti KITTI config, fp32 for bit-parity."""
    return OccDepthConfig(
        dataset="kitti",
        full_scene_size=(256, 256, 32),
        project_scale=2,
        feature=32,
        feature_2d_oc=32,
        n_classes=20,
        multi_view_mode=True,
        use_stereo_depth_gt=True,
        cascade_cls=True,
        context_prior=True,
        trans_2d_to_3d="flosp_depth",
        backbone_2d_name="tf_efficientnet_b3_ns",
        compute_dtype="float32",
    )


def fullres_nyu_config() -> OccDepthConfig:
    """The NYU 2080ti virtual-stereo config, fp32."""
    return OccDepthConfig(
        dataset="NYU",
        full_scene_size=(60, 36, 60),
        project_scale=1,
        feature=100,
        feature_2d_oc=100,
        n_classes=12,
        n_relations=4,
        multi_view_mode=False,
        use_depth_gt=True,
        cascade_cls=False,
        context_prior=True,
        trans_2d_to_3d="flosp",
        backbone_2d_name="tf_efficientnet_b4_ns",
        compute_dtype="float32",
    )


def _digest(name, arr, out):
    flat = np.asarray(arr, np.float32).reshape(-1)
    probe_idx = np.linspace(0, flat.size - 1, min(N_PROBE, flat.size))
    out[f"{name}.mean"] = np.float32(flat.mean())
    out[f"{name}.std"] = np.float32(flat.std())
    out[f"{name}.probe"] = flat[probe_idx.astype(np.int64)]
    a = np.asarray(arr, np.float32)
    out[f"{name}.chan_mean"] = a.reshape(-1, a.shape[-1]).mean(0)


def _run_kitti():
    from tests.torch_oracle import TorchOccDepth, randomize_bn

    cfg = fullres_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=31,
                                 with_labels=False)

    torch.manual_seed(17)
    oracle = TorchOccDepth(cfg).eval()
    randomize_bn(oracle, seed=17)

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
    del oracle
    params, stats, missing = convert_state_dict(sd, cfg)
    assert not missing, missing[:10]
    del sd

    model = OccDepthModel(cfg=cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    return ref, out


def _run_nyu():
    from tests.torch_oracle import TorchOccDepthNYU, randomize_bn

    cfg = fullres_nyu_config()
    batch = make_synthetic_batch(cfg, batch_size=1, seed=32)

    torch.manual_seed(19)
    oracle = TorchOccDepthNYU(cfg).eval()
    randomize_bn(oracle, seed=19)

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
    del oracle
    params, stats, missing = convert_state_dict(sd, cfg)
    assert not missing, missing[:10]
    del sd

    model = OccDepthModel(cfg=cfg)
    out = model.apply(
        {"params": params, "batch_stats": stats}, batch, train=False
    )
    return ref, out


def _check(ref, out, heads, golden_path):
    """Assert oracle parity per head + digest-match vs the golden fixture."""
    diffs = {}
    for head, (perm, atol) in heads.items():
        got = np.asarray(out[head], np.float32)
        if perm is not None:
            got = got.transpose(perm)
        want = ref[head].numpy()
        diffs[head] = float(np.abs(got - want).max())
        np.testing.assert_allclose(got, want, atol=atol, err_msg=head)

    digests = {}
    for head in sorted(heads):
        _digest(head, out[head], digests)
    if os.path.exists(golden_path):
        g = np.load(golden_path)
        for k in sorted(digests):
            atol = 2e-4 if k.endswith((".mean", ".std", ".chan_mean")) else 5e-3
            np.testing.assert_allclose(
                digests[k], g[k], atol=atol,
                err_msg=f"golden drift at {k} — regenerate deliberately via "
                        "`python -m tests.test_fullres_parity`",
            )
    return diffs, digests


KITTI_HEADS = {
    # head -> (transpose to torch layout, atol)
    "ssc_logit": ((0, 4, 1, 2, 3), 5e-3),
    "occ_logit": ((0, 4, 1, 2, 3), 5e-3),
    "P_logits": (None, 5e-3),
    "depth_pred": ((0, 1, 4, 2, 3), 1e-3),
}
NYU_HEADS = {
    "ssc_logit": ((0, 4, 1, 2, 3), 5e-3),
    "P_logits": (None, 5e-3),
}


@pytest.mark.slow
def test_fullres_kitti_flagship_parity():
    ref, out = _run_kitti()
    diffs, _ = _check(ref, out, KITTI_HEADS,
                      os.path.join(GOLDEN_DIR, "fullres_kitti.npz"))
    print("fullres KITTI max-abs-diffs:", diffs)


@pytest.mark.slow
def test_fullres_nyu_parity():
    ref, out = _run_nyu()
    diffs, _ = _check(ref, out, NYU_HEADS,
                      os.path.join(GOLDEN_DIR, "fullres_nyu.npz"))
    print("fullres NYU max-abs-diffs:", diffs)


if __name__ == "__main__":
    import sys

    # parity needs real fp32 — force CPU before any computation (the
    # sitecustomize force-selects the axon TPU backend via jax.config,
    # overriding JAX_PLATFORMS; under pytest, conftest.py does this)
    import jax

    jax.config.update("jax_platforms", "cpu")

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    if which in ("kitti", "both"):
        ref, out = _run_kitti()
        diffs = {h: float(np.abs(
            (np.asarray(out[h], np.float32).transpose(p) if p else
             np.asarray(out[h], np.float32)) - ref[h].numpy()).max())
            for h, (p, _) in KITTI_HEADS.items()}
        digests = {}
        for head in sorted(KITTI_HEADS):
            _digest(head, out[head], digests)
        np.savez(os.path.join(GOLDEN_DIR, "fullres_kitti.npz"), **digests)
        print("KITTI max-abs-diffs:", diffs)
        print("wrote", os.path.join(GOLDEN_DIR, "fullres_kitti.npz"))
    if which in ("nyu", "both"):
        ref, out = _run_nyu()
        diffs = {h: float(np.abs(
            (np.asarray(out[h], np.float32).transpose(p) if p else
             np.asarray(out[h], np.float32)) - ref[h].numpy()).max())
            for h, (p, _) in NYU_HEADS.items()}
        digests = {}
        for head in sorted(NYU_HEADS):
            _digest(head, out[head], digests)
        np.savez(os.path.join(GOLDEN_DIR, "fullres_nyu.npz"), **digests)
        print("NYU max-abs-diffs:", diffs)
        print("wrote", os.path.join(GOLDEN_DIR, "fullres_nyu.npz"))
