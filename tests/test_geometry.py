"""Geometry core vs slow per-element oracles mirroring the reference math."""
import numpy as np
import pytest

from occdepth_tpu.geometry import (
    PIXEL_PATTERNS,
    compute_cp_mega_matrix,
    compute_local_frustums,
    vox2pix,
)
from occdepth_tpu.geometry.projection import feature_dims, flat_gather_indices


def _oracle_vox2pix(cam_E, cam_k, vox_origin, voxel_size, img_W, img_H,
                    scene_size, pattern_id):
    """Literal per-voxel loop implementing helpers.py:94-169 semantics."""
    vol_dim = [int(np.ceil(s / voxel_size)) for s in scene_size]
    pattern = PIXEL_PATTERNS[pattern_id]
    pix = []
    fov = []
    zs = []
    fx, fy = cam_k[0, 0], cam_k[1, 1]
    cx, cy = cam_k[0, 2], cam_k[1, 2]
    for i in range(vol_dim[0]):
        for j in range(vol_dim[1]):
            for k in range(vol_dim[2]):
                p = np.float32(vox_origin) + voxel_size * (
                    np.array([i, j, k], np.float32) + 0.5
                )
                c = (cam_E[:3, :3].astype(np.float32) @ p
                     + cam_E[:3, 3].astype(np.float32))
                xc = int(np.round(c[0] * np.float32(fx) / c[2] + np.float32(cx)))
                yc = int(np.round(c[1] * np.float32(fy) / c[2] + np.float32(cy)))
                pp = [(xc + dx, yc + dy) for (dx, dy) in pattern]
                pix.append(pp)
                zs.append(c[2])
                fov.append([
                    0 <= x < img_W and 0 <= y < img_H and c[2] > 0
                    for (x, y) in pp
                ])
    return np.array(pix), np.array(fov), np.array(zs)


@pytest.mark.parametrize("pattern_id", [0, 1, 4])
def test_vox2pix_matches_oracle(pattern_id):
    rs = np.random.RandomState(0)
    cam_k = np.array([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    angle = 0.1
    cam_E = np.eye(4)
    cam_E[:3, :3] = np.array([
        [np.cos(angle), -np.sin(angle), 0],
        [np.sin(angle), np.cos(angle), 0],
        [0, 0, 1],
    ])
    cam_E[:3, 3] = [0.1, -0.2, 0.3]
    vox_origin = np.array([0.0, -1.6, -0.4])
    out = vox2pix(cam_E, cam_k, vox_origin, 0.4, 64, 48, (3.2, 3.2, 0.8),
                  pattern_id)
    ref = _oracle_vox2pix(cam_E, cam_k, vox_origin, 0.4, 64, 48,
                          (3.2, 3.2, 0.8), pattern_id)
    np.testing.assert_array_equal(out[0], ref[0])
    np.testing.assert_array_equal(out[1], ref[1])
    np.testing.assert_allclose(out[2], ref[2], rtol=1e-5)


def test_feature_dims_ceil_halving():
    assert feature_dims(370, 1220, 1) == (370, 1220)
    assert feature_dims(370, 1220, 2) == (185, 610)
    assert feature_dims(370, 1220, 4) == (93, 305)
    assert feature_dims(370, 1220, 8) == (47, 153)
    assert feature_dims(370, 1220, 16) == (24, 77)


def test_flat_gather_indices_sentinel():
    pix = np.array([[[5, 3], [7, 9]]])  # (N=1, P=2, 2)
    fov = np.array([[True, False]])
    idx = flat_gather_indices(pix, fov, img_H=10, img_W=8, scale=1)
    assert idx[0, 0] == 3 * 8 + 5
    assert idx[0, 1] == 10 * 8  # sentinel


def _oracle_cp_matrix(target, is_binary=False):
    """Literal triple loop implementing helpers.py:6-91 semantics."""
    label = target.reshape(-1)
    N = label.shape[0]
    sv = [i // 2 for i in target.shape]
    n_rel = 2 if is_binary else 4
    matrix = np.zeros((n_rel, N, sv[0] * sv[1] * sv[2]), np.uint8)
    for xx in range(sv[0]):
        for yy in range(sv[1]):
            for zz in range(sv[2]):
                col = xx * (sv[1] * sv[2]) + yy * sv[2] + zz
                megas = np.array([
                    target[xx * 2, yy * 2, zz * 2],
                    target[xx * 2 + 1, yy * 2, zz * 2],
                    target[xx * 2, yy * 2 + 1, zz * 2],
                    target[xx * 2, yy * 2, zz * 2 + 1],
                    target[xx * 2 + 1, yy * 2 + 1, zz * 2],
                    target[xx * 2 + 1, yy * 2, zz * 2 + 1],
                    target[xx * 2, yy * 2 + 1, zz * 2 + 1],
                    target[xx * 2 + 1, yy * 2 + 1, zz * 2 + 1],
                ])
                megas = megas[megas != 255]
                for m in megas:
                    lc = np.ones(N) * m
                    lr = label
                    if not is_binary:
                        matrix[0, (lr != 255) & (lc == lr) & (lc != 0), col] = 1
                        matrix[1, (lr != 255) & (lc != lr) & (lc != 0) & (lr != 0), col] = 1
                        matrix[2, (lr != 255) & (lr == lc) & (lc == 0), col] = 1
                        matrix[3, (lr != 255) & (lr != lc) & ((lr == 0) | (lc == 0)), col] = 1
                    else:
                        matrix[0, (lr != 255) & (lc != lr), col] = 1
                        matrix[1, (lr != 255) & (lc == lr), col] = 1
    return matrix


@pytest.mark.parametrize("is_binary", [False, True])
def test_cp_mega_matrix(is_binary):
    rs = np.random.RandomState(1)
    target = rs.choice([0, 1, 2, 3, 255], size=(6, 4, 4),
                       p=[0.4, 0.2, 0.15, 0.15, 0.1]).astype(np.int32)
    out = compute_cp_mega_matrix(target, is_binary)
    ref = _oracle_cp_matrix(target, is_binary)
    np.testing.assert_array_equal(out, ref)


def test_local_frustums_kitti():
    rs = np.random.RandomState(2)
    H, W, D = 8, 8, 4
    N = H * W * D
    V = 2
    pix = rs.randint(-5, 70, size=(V, N, 3, 2))
    pix_z = rs.uniform(-1, 5, size=(V, N))
    target = rs.choice([0, 1, 2, 255], size=(H, W, D)).astype(np.int32)
    masks, dists = compute_local_frustums(
        pix, pix_z, target, img_W=64, img_H=48, dataset="kitti",
        n_classes=3, size=2,
    )
    assert masks.shape == (4, H, W, D)
    assert dists.shape == (4, 3)
    # oracle: per-tile recompute (mirrors helpers.py:219-256)
    for t, (ty, tx) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        sx, ex = tx * 32, (tx + 1) * 32
        sy, ey = ty * 24, (ty + 1) * 24
        lf = np.zeros(N, bool)
        for v in range(V):
            lf |= (
                (pix[v, :, 0, 0] >= sx) & (pix[v, :, 0, 0] < ex)
                & (pix[v, :, 0, 1] >= sy) & (pix[v, :, 0, 1] < ey)
                & (pix_z[v] > 0)
            )
        mask = (target != 255) & lf.reshape(H, W, D)
        np.testing.assert_array_equal(masks[t], mask)
        cls, cnt = np.unique(target[mask], return_counts=True)
        exp = np.zeros(3)
        exp[cls.astype(int)] = cnt
        np.testing.assert_array_equal(dists[t], exp)
