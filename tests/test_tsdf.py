"""TSDF fusion sanity: a flat wall integrates to a zero-crossing at depth."""
import numpy as np

from occdepth_tpu.geometry.tsdf import TSDFVolume, write_ply_points


def test_flat_wall(tmp_path):
    H, W = 48, 64
    f = 50.0
    intr = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    depth = np.full((H, W), 2.0, np.float32)  # wall at z=2m
    color = np.full((H, W, 3), 128, np.uint8)

    vol = TSDFVolume(
        np.array([[-1.5, 1.5], [-1.5, 1.5], [0.0, 3.0]]), voxel_size=0.1
    )
    cam_pose = np.eye(4)  # camera at origin looking +z
    for _ in range(3):
        vol.integrate(color, depth, intr, cam_pose)

    tsdf, _ = vol.get_volume()
    # voxels just in front of the wall (z~1.5) positive, behind (z~2.4)
    # observed-negative within the truncation margin
    zi_front = int((1.5 - 0.0) / 0.1)
    zi_behind = int((2.3 - 0.0) / 0.1)
    ci = tsdf.shape[0] // 2
    assert tsdf[ci, ci, zi_front] > 0.5
    assert tsdf[ci, ci, zi_behind] < 0.0

    pts = vol.get_point_cloud()
    # surface points concentrate near z=2
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.15
    write_ply_points(str(tmp_path / "pc.ply"), pts[:10])


def test_nyu_flosp_depth_dynamic_bounds():
    """NYU flosp_depth path (per-batch voxel origin) compiles and runs."""
    import jax

    from occdepth_tpu.data.batch import make_synthetic_batch
    from occdepth_tpu.config import FlospDepthConfig
    from occdepth_tpu.models import OccDepthModel
    from occdepth_tpu.testing import tiny_nyu_config

    fd = FlospDepthConfig(
        x_bound=(0.0, 4.8, 0.3),
        y_bound=(-2.4, 2.4, 0.3),
        z_bound=(0.0, 2.4, 0.3),
        d_bound=(0.0, 6.0, 0.3),
        final_dim=(64, 80),
        mid_channels=16,
    )
    cfg = tiny_nyu_config(
        trans_2d_to_3d="flosp_depth", flosp_depth_override=fd
    )
    batch = make_synthetic_batch(cfg, batch_size=1, seed=7)
    model = OccDepthModel(cfg=cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)
    out = model.apply(variables, batch, train=False)
    X, Y, Z = cfg.full_scene_size
    assert out["ssc_logit"].shape == (1, X, Y, Z, cfg.n_classes)
    assert "depth_pred" in out
    assert np.isfinite(np.asarray(out["ssc_logit"])).all()
