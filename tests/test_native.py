"""Native C++ preprocessing kernels vs numpy fallbacks + torch-free oracles."""
import numpy as np
import pytest

from occdepth_tpu import native_ext as ne


@pytest.fixture(autouse=True)
def ensure_built():
    ne.build()
    yield


def _oracle_downsample(label, ds):
    """Literal loop implementing NYU/preprocess.py:102-143 semantics."""
    X, Y, Z = label.shape
    sx, sy, sz = X // ds, Y // ds, Z // ds
    out = np.zeros((sx, sy, sz), np.uint8)
    empty_t = 0.95 * ds ** 3
    for x in range(sx):
        for y in range(sy):
            for z in range(sz):
                blk = label[x * ds:(x + 1) * ds, y * ds:(y + 1) * ds,
                            z * ds:(z + 1) * ds].reshape(-1)
                c0 = (blk == 0).sum()
                c255 = (blk == 255).sum()
                if c0 + c255 > empty_t:
                    out[x, y, z] = 0 if c0 > c255 else 255
                else:
                    sem = blk[(blk > 0) & (blk < 255)]
                    out[x, y, z] = np.argmax(np.bincount(sem))
    return out


@pytest.mark.parametrize("ds", [2, 4])
def test_downsample_label(ds, rng):
    label = rng.choice(
        [0, 1, 2, 3, 7, 255], size=(16, 8, 16),
        p=[0.55, 0.1, 0.1, 0.05, 0.05, 0.15],
    ).astype(np.uint8)
    native = ne.downsample_label(label, ds)
    fallback = ne._downsample_label_np(label, ds)
    oracle = _oracle_downsample(label, ds)
    np.testing.assert_array_equal(native, oracle)
    np.testing.assert_array_equal(fallback, oracle)


def test_rle_decode_and_bits(rng):
    rle = np.array([0, 100, 5, 20, 255, 30, 36, 50], np.uint32)
    cmap = np.arange(37, dtype=np.uint8) % 12
    out = ne.rle_decode(rle, cmap, 200)
    assert (out[:100] == 0).all()
    assert (out[100:120] == 5 % 12).all()
    assert (out[120:150] == 255).all()
    assert (out[150:200] == 36 % 12).all()

    bits = (rng.rand(128) > 0.5).astype(np.uint8)
    packed = ne.pack_bits(bits)
    np.testing.assert_array_equal(packed, np.packbits(bits))
    np.testing.assert_array_equal(ne.unpack_bits(packed), bits)


def test_voxel_vote(rng):
    n = 500
    vi = rng.randint(-2, 6, size=(n, 3)).astype(np.int32)
    ci = rng.randint(0, 4, size=n).astype(np.int32)
    nb, nc = ne.voxel_vote(vi, ci, (5, 5, 5), 4)
    # numpy oracle
    binary = np.zeros((5, 5, 5), np.uint8)
    counts = np.zeros((5, 5, 5, 4), np.int32)
    for i in range(n):
        x, y, z = vi[i]
        if 0 <= x < 5 and 0 <= y < 5 and 0 <= z < 5:
            binary[x, y, z] = 1
            counts[x, y, z, ci[i]] += 1
    cls = np.where(binary > 0, counts.argmax(-1), 0).astype(np.uint8)
    np.testing.assert_array_equal(nb, binary)
    np.testing.assert_array_equal(nc, cls)


def test_frustum_class_dists_native_vs_numpy(rng):
    """C++ one-pass histogram == the vectorized numpy fallback."""
    import occdepth_tpu.native_ext as ne_mod
    from occdepth_tpu.geometry.frustums_mask import compute_frustum_class_dists

    V, N, C, size, W, H = 2, 4000, 5, 4, 64, 48
    pix = rng.randint(-10, W + 10, size=(V, N, 1, 2)).astype(np.int32)
    pz = (rng.randn(V, N)).astype(np.float32)
    X, Y, Z = 20, 20, 10
    tgt = rng.randint(0, C, size=(X, Y, Z)).astype(np.int32)
    tgt[rng.rand(X, Y, Z) > 0.9] = 255

    native = ne_mod.frustum_class_dists(
        pix[:, :, 0, 0], pix[:, :, 0, 1], pz, tgt.reshape(-1), size, W, H, C
    )
    orig = ne_mod.frustum_class_dists
    ne_mod.frustum_class_dists = lambda *a, **k: None
    try:
        ref = compute_frustum_class_dists(
            pix, pz, tgt, W, H, "kitti", C, size
        )
    finally:
        ne_mod.frustum_class_dists = orig
    if native is None:
        pytest.skip("native library unavailable")
    np.testing.assert_array_equal(native, ref)
