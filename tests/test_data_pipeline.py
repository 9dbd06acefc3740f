"""End-to-end data pipeline on a synthetic on-disk KITTI/NYU mini-dataset.

Mirrors the reference's `kitti_dm.py __main__` smoke test (dump one collated
batch) but with generated fixture files, and checks the batch feeds the
model schema.
"""
import os
import pickle

import numpy as np
import pytest

from occdepth_tpu.native_ext import pack_bits
from occdepth_tpu.testing import tiny_kitti_config, tiny_nyu_config


def _write_png(path, arr):
    from PIL import Image

    Image.fromarray(arr).save(path)


@pytest.fixture
def kitti_tree(tmp_path, rng):
    """Minimal KITTI tree: 1 sequence, 2 frames, full-size images/labels."""
    root = tmp_path / "kitti"
    pre = tmp_path / "pre"
    depth_root = tmp_path / "stereo_depth"
    seq = root / "dataset" / "sequences" / "08"
    (seq / "voxels").mkdir(parents=True)
    (seq / "image_2").mkdir()
    (seq / "image_3").mkdir()
    labels = pre / "labels" / "08"
    labels.mkdir(parents=True)
    ddir = depth_root / "dataset" / "sequences" / "08" / "depth"
    ddir.mkdir(parents=True)

    with open(seq / "calib.txt", "w") as f:
        P2 = "7.07 0 60.18 0 0 7.07 18.31 0 0 0 1 0"
        P3 = "7.07 0 60.18 -3.8 0 7.07 18.31 0 0 0 1 0"
        Tr = "0 -1 0 0 0 0 -1 0 1 0 0 -0.27"
        f.write(f"P2: {P2}\nP3: {P3}\nTr: {Tr}\n\n")

    H, W = 370, 1220
    for frame in ("000000", "000005"):
        (seq / "voxels" / f"{frame}.bin").write_bytes(
            pack_bits((rng.rand(256 * 256 * 32) > 0.5).astype(np.uint8)).tobytes()
        )
        (seq / "voxels" / f"{frame}.occluded").write_bytes(
            pack_bits((rng.rand(256 * 256 * 32) > 0.7).astype(np.uint8)).tobytes()
        )
        img = (rng.rand(H + 6, W + 20, 3) * 255).astype(np.uint8)
        _write_png(seq / "image_2" / f"{frame}.png", img)
        _write_png(seq / "image_3" / f"{frame}.png", img)
        t11 = rng.choice([0, 1, 5, 255], size=(256, 256, 32)).astype(np.uint8)
        np.save(labels / f"{frame}_1_1.npy", t11)
        np.save(labels / f"{frame}_1_8.npy", t11[::8, ::8, ::8])
        depth = (rng.rand(H, W) * 256 * 30).astype(np.uint16)
        _write_png(ddir / f"{frame}.png", depth)
    return str(root), str(pre), str(depth_root)


def test_kitti_dataset_batch(kitti_tree):
    root, pre, depth_root = kitti_tree
    # full-size geometry but tiny frustum count to keep the test fast
    from occdepth_tpu.config import OccDepthConfig

    cfg = OccDepthConfig(
        dataset="kitti", data_root=root, data_preprocess_root=pre,
        data_stereo_depth_root=depth_root, use_stereo_depth_gt=True,
        multi_view_mode=True, frustum_size=2, n_relations=4,
        context_prior=True, pattern_id=0, occluded_cls=True,
    )
    from occdepth_tpu.data.kitti import KittiDataset, Loader, collate

    ds = KittiDataset(cfg, "val")
    assert len(ds) == 2
    batch = collate([ds[0], ds[1]])
    N = 128 * 128 * 16
    assert batch["img"].shape == (2, 2, 370, 1220, 3)
    assert batch["projected_pix"].shape == (2, 2, N, 1, 2)
    assert batch["fov_mask"].shape == (2, 2, N, 1)
    assert batch["target"].shape == (2, 256, 256, 32)
    assert batch["CP_mega_matrices"].shape == (2, 4, 4096, 512)
    # masks are rebuilt on device (losses/fp_device.py); only the class
    # histograms ship with the batch
    assert "frustums_masks" not in batch
    assert batch["frustums_class_dists"].shape == (2, 4, 20)
    assert batch["gt_depth"].shape == (2, 1, 370, 1220)
    assert batch["occluded"].shape == (2, 256, 256, 32)
    assert batch["cam_k"].dtype == np.float32
    # loader iteration
    loader = Loader(ds, batch_size=2, shuffle=False, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1
    # FOV must contain voxels (sane geometry)
    assert batch["fov_mask"].sum() > 1000


@pytest.fixture
def nyu_tree(tmp_path, rng):
    root = tmp_path / "nyu" / "NYUtest"
    base = tmp_path / "pre" / "base" / "NYUtest"
    root.mkdir(parents=True)
    base.mkdir(parents=True)
    cam_pose = np.eye(4, dtype=np.float32)
    cam_pose[:3, :3] = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)
    cam_pose[:3, 3] = [2.0, 0.0, 1.2]
    for name in ("NYU0001_0000", "NYU0002_0000"):
        (root / f"{name}.bin").write_bytes(b"\0" * 16)
        img = (rng.rand(480, 640, 3) * 255).astype(np.uint8)
        _write_png(root / f"{name}_color.jpg", img)
        depth = (rng.rand(480, 640) * 8000 * 4).astype(np.uint16)
        _write_png(root / f"{name}.png", depth)
        data = {
            "cam_pose": cam_pose,
            "voxel_origin": np.array([0.0, -2.4, 0.0], np.float32),
            "target_1_4": rng.choice(
                [0, 1, 5, 255], size=(60, 36, 60)).astype(np.uint8),
            "target_1_16": rng.choice(
                [0, 1, 5, 255], size=(15, 9, 15)).astype(np.uint8),
        }
        with open(base / f"{name}.pkl", "wb") as f:
            pickle.dump(data, f)
    return str(tmp_path / "nyu"), str(tmp_path / "pre")


def test_nyu_dataset_batch(nyu_tree):
    root, pre = nyu_tree
    from occdepth_tpu.config import OccDepthConfig

    cfg = OccDepthConfig(
        dataset="NYU", data_root=root, data_preprocess_root=pre,
        use_depth_gt=True, multi_view_mode=False, frustum_size=2,
        full_scene_size=(60, 36, 60), project_scale=1, n_classes=12,
        project_1_8=False, trans_2d_to_3d="flosp",
    )
    from occdepth_tpu.data.nyu import NYUDataset, collate

    ds = NYUDataset(cfg, "test")
    assert len(ds) == 2
    batch = collate([ds[0], ds[1]])
    N = 60 * 60 * 36
    assert batch["img"].shape == (2, 1, 480, 640, 3)
    assert batch["projected_pix"].shape == (2, 2, N, 1, 2)  # real + virtual
    assert batch["target"].shape == (2, 60, 36, 60)
    assert batch["gt_depth"].shape == (2, 1, 480, 640)
    assert batch["vox_origin"].shape == (2, 3)
