"""CLI-tool coverage: submission writer + validator roundtrip, the headless
visualizer (render/GIF/batch main), and the TartanAir voxel-export CLI.

These exercise the pieces of the script layer that do not need a trained
model: the CodaLab submission format (reference
generate_kitti_submission.py:62-85 + valid_kitti_submission.py:29-279),
the generate_output pickle schema consumed by the visualizer, and the
depth->voxel export pipeline (export_voxels.py:110-168).
"""
import os
import pickle
import sys
import zipfile

import numpy as np
import pytest

from occdepth_tpu.data.kitti_io import TEST_SEQUENCES, get_inv_map
from occdepth_tpu.scripts.generate_kitti_submission import write_prediction
from occdepth_tpu.scripts.valid_kitti_submission import (
    validate_dir,
    validate_zip,
)


@pytest.fixture
def submission_dir(tmp_path, rng):
    inv_map = get_inv_map()
    out = tmp_path / "sub"
    for seq in TEST_SEQUENCES:
        y_pred = rng.randint(0, 20, size=(256, 256, 32))
        write_prediction(str(out), seq, "000000", y_pred, inv_map)
    return out


def test_submission_roundtrip_valid(submission_dir, tmp_path):
    assert validate_dir(str(submission_dir)) == []
    # zip mode (the actual CodaLab upload format)
    zip_path = tmp_path / "sub.zip"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for root, _, files in os.walk(submission_dir):
            for f in files:
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, submission_dir))
    assert validate_zip(str(zip_path)) == []


def test_submission_validator_catches_errors(submission_dir):
    # truncated file
    bad = submission_dir / "sequences" / "11" / "predictions" / "000000.label"
    bad.write_bytes(bad.read_bytes()[:100])
    # invalid raw id (train ids are NOT raw ids: e.g. 5 is not in inv_map)
    bad2 = submission_dir / "sequences" / "12" / "predictions" / "000000.label"
    np.full(256 * 256 * 32, 7, np.uint16).tofile(bad2)
    # missing sequence
    import shutil

    shutil.rmtree(submission_dir / "sequences" / "21")
    errors = validate_dir(str(submission_dir))
    assert any("expected" in e and "11/" in e for e in errors)
    assert any("invalid raw label ids" in e and "12/" in e for e in errors)
    assert any("missing directory" in e and "21" in e for e in errors)


def _make_record(rng, shape=(32, 32, 8)):
    vol = rng.choice([0, 0, 0, 1, 5, 9, 255], size=shape).astype(np.uint8)
    fov = rng.rand(vol.size) > 0.4
    cam_k = np.array([[50.0, 0, 48.0], [0, 50.0, 16.0], [0, 0, 1]])
    T = np.eye(4)
    T[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    return {
        "y_pred": vol,
        "target": vol,
        "fov_mask_1": fov,
        "cam_k": cam_k,
        "T_velo_2_cam": T,
        "vox_origin": np.array([0.0, -3.2, -1.0]),
    }


def test_voxel_vis_batch_main(tmp_path, rng, monkeypatch):
    """End-to-end visualizer CLI: pickles -> per-frame PNGs + animated GIF."""
    from occdepth_tpu.scripts.visualization import voxel_vis

    in_dir = tmp_path / "preds"
    in_dir.mkdir()
    for i in range(2):
        with open(in_dir / f"08_{i:06d}.pkl", "wb") as f:
            pickle.dump(_make_record(rng), f)
    out_dir = tmp_path / "vis"
    gif = tmp_path / "seq.gif"
    monkeypatch.setattr(sys, "argv", [
        "voxel_vis", "--input-dir", str(in_dir), "--output-dir", str(out_dir),
        "--dataset", "kitti", "--with-target", "--gif", str(gif),
    ])
    voxel_vis.main()
    pngs = sorted(os.listdir(out_dir))
    assert pngs == ["08_000000.png", "08_000001.png"]
    for p in pngs:
        assert (out_dir / p).stat().st_size > 1000
    assert gif.exists() and gif.stat().st_size > 1000


def test_export_voxels_tartanair_sequence(tmp_path):
    """Synthetic TartanAir sequence through the export CLI (workers=1)."""
    from occdepth_tpu.scripts.export_voxels_tartanair import (
        VOX_SHAPE,
        export_sequence,
    )

    seq_dir = tmp_path / "office" / "Easy" / "P000"
    (seq_dir / "depth_left").mkdir(parents=True)
    (seq_dir / "seg_left").mkdir()
    H, W = 480, 640
    # frames 0..9; only % 5 == 0 exported (000000, 000005)
    with open(seq_dir / "pose_left.txt", "w") as f:
        for i in range(10):
            f.write("0 0 0 0 0 0 1\n")  # identity quaternion pose
    for i in range(10):
        depth = np.full((H, W), 3.0 + 0.1 * i, np.float32)
        seg = np.full((H, W), 139, np.uint8)  # "floor" -> class 2
        np.save(seq_dir / "depth_left" / f"{i:06d}_left_depth.npy", depth)
        np.save(seq_dir / "seg_left" / f"{i:06d}_left_seg.npy", seg)

    out_root = tmp_path / "pre"
    export_sequence(str(tmp_path), str(out_root), "office", "Easy", "P000",
                    workers=1)
    out_dir = out_root / "labels" / "office" / "Easy" / "P000" / "voxels_left"
    files = sorted(os.listdir(out_dir))
    assert files == ["000000.pkl", "000005.pkl"]
    with open(out_dir / "000000.pkl", "rb") as f:
        rec = pickle.load(f)
    assert rec["target_1_1"].shape == VOX_SHAPE
    assert rec["target_1_4"].shape == tuple(s // 4 for s in VOX_SHAPE)
    occupied = rec["target_1_1"][rec["target_1_1"] > 0]
    assert occupied.size > 0 and set(np.unique(occupied)) == {2}
    assert rec["fov_mask_1_1"].sum() == (rec["target_1_1"] > 0).sum()


def test_generate_output_records(tmp_path):
    """dump_records (the generate_output inference loop) at the tiny config:
    pickle schema matches what the visualizer consumes."""
    import jax

    from occdepth_tpu.data.batch import make_synthetic_batch
    from occdepth_tpu.models import OccDepthModel
    from occdepth_tpu.scripts.generate_output import dump_records
    from occdepth_tpu.testing import tiny_kitti_config

    cfg = tiny_kitti_config()
    batch = make_synthetic_batch(cfg, batch_size=2, seed=3)
    model = OccDepthModel(cfg=cfg)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch, train=False
    )
    batch = dict(batch)
    batch["frame_id"] = ["000000", "000005"]
    batch["sequence"] = ["08", "08"]
    paths = list(dump_records(cfg, variables, [batch], str(tmp_path)))
    assert sorted(os.path.basename(p) for p in paths) == [
        "08_000000.pkl", "08_000005.pkl",
    ]
    with open(paths[0], "rb") as f:
        rec = pickle.load(f)
    X, Y, Z = cfg.full_scene_size
    assert rec["y_pred"].shape == (X, Y, Z)
    assert rec["y_pred"].dtype == np.uint8
    assert rec["target"].shape == (X, Y, Z)
    assert rec["cam_k"].shape == (3, 3)
    assert rec["T_velo_2_cam"].shape == (4, 4)
    # full-scale (1_1) fov — must reshape onto y_pred in the visualizers
    # (the model batch only carries the project-scale mask)
    assert rec["fov_mask_1"].dtype == bool
    assert rec["fov_mask_1"].size == rec["y_pred"].size


def test_infer_cli_single_frame(tmp_path, rng, monkeypatch):
    """Ad-hoc inference CLI: stereo PNGs + calib.txt -> pickle + render,
    no dataset tree, no checkpoint (random weights with a warning)."""
    from PIL import Image

    from occdepth_tpu.scripts import infer

    H, W = 64, 96
    for name in ("l.png", "r.png"):
        Image.fromarray(
            (rng.rand(H + 4, W + 8, 3) * 255).astype(np.uint8)
        ).save(tmp_path / name)
    f = 0.9 * W
    with open(tmp_path / "calib.txt", "w") as fh:
        fh.write(f"P2: {f} 0 {W/2} 0 0 {f} {H/2} 0 0 0 1 0\n")
        fh.write(f"P3: {f} 0 {W/2} {-0.5*f} 0 {f} {H/2} 0 0 0 1 0\n")
        fh.write("Tr: 0 -1 0 0 0 0 -1 0 1 0 0 -0.27\n")

    out_pkl = tmp_path / "pred.pkl"
    out_png = tmp_path / "pred.png"
    monkeypatch.setattr(sys, "argv", [
        "infer", "--config",
        "occdepth_tpu/configs/semantic_kitti/multicam_flospdepth_crp_stereodepth_cascadecls.yaml",
        "--left", str(tmp_path / "l.png"), "--right", str(tmp_path / "r.png"),
        "--calib", str(tmp_path / "calib.txt"),
        "--output", str(out_pkl), "--render", str(out_png),
        "--ckpt", "nonexistent",
        # tiny geometry overrides (CPU-sized; flosp avoids the
        # flosp_depth conf override that YAML cannot express)
        "trans_2d_to_3d=flosp", "full_scene_size=[32,32,16]",
        "scene_size_m=[6.4,6.4,3.2]", "voxel_size_m=0.2",
        f"img_shape_hw=[{H},{W}]", "feature=16", "feature_2d_oc=16",
        "compute_dtype=float32", f"logdir={tmp_path}/logdir",
    ])
    infer.main()
    with open(out_pkl, "rb") as fh:
        rec = pickle.load(fh)
    assert rec["y_pred"].shape == (32, 32, 16)
    assert rec["fov_mask_1"].size == rec["y_pred"].size
    assert out_png.stat().st_size > 1000
