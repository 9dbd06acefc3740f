"""ctypes bindings for the native preprocessing kernels, with numpy fallbacks.

Build the shared library with `python -m occdepth_tpu.native_ext build`
(plain g++ -O3 -shared; no pybind11 needed).  Every binding has a pure-numpy
fallback so the framework works without the .so; tests assert C++ == numpy.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "preprocess_kernels.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "libocc_preprocess.so")

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the native library (g++ -O3 -march=native -shared -fPIC)."""
    if os.path.exists(_SO) and not force and (
        os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        _SRC, "-o", _SO,
    ]
    subprocess.run(cmd, check=True)
    return _SO


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            build()
        except Exception:
            return None
    lib = ctypes.CDLL(_SO)
    i64 = ctypes.c_int64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.downsample_label_u8.argtypes = [u8p, i64, i64, i64, i64, u8p]
    lib.rle_decode_u8.argtypes = [u32p, i64, u8p, i64, u8p, i64]
    lib.rle_decode_u8.restype = i64
    lib.voxel_vote_u8.argtypes = [
        i32p, i32p, i64, i64, i64, i64, i64, i32p, u8p, u8p,
    ]
    lib.unpack_bits_u8.argtypes = [u8p, i64, u8p]
    lib.pack_bits_u8.argtypes = [u8p, i64, u8p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    try:
        lib.frustum_class_dists_i32.argtypes = [
            i32p, i32p, f32p, i32p, i64, i64, i64, i64, i64, i64, i64p,
        ]
    except AttributeError:
        # stale .so from before this kernel existed; rebuild picks it up
        pass
    _lib = lib
    return lib


# ---------------------------------------------------------------------------
# Public API (native when available, numpy otherwise)
# ---------------------------------------------------------------------------

def downsample_label(label: np.ndarray, ds: int) -> np.ndarray:
    """Majority-pool (X, Y, Z) labels by ds (NYU/preprocess.py:102-143)."""
    if ds == 1:
        return label
    lab = np.ascontiguousarray(label, dtype=np.uint8)
    X, Y, Z = lab.shape
    lib = _load()
    if lib is not None:
        out = np.empty((X // ds, Y // ds, Z // ds), np.uint8)
        lib.downsample_label_u8(lab, X, Y, Z, ds, out)
        return out
    return _downsample_label_np(lab, ds)


def _downsample_label_np(label: np.ndarray, ds: int) -> np.ndarray:
    X, Y, Z = label.shape
    sx, sy, sz = X // ds, Y // ds, Z // ds
    blocks = label[: sx * ds, : sy * ds, : sz * ds].reshape(
        sx, ds, sy, ds, sz, ds
    ).transpose(0, 2, 4, 1, 3, 5).reshape(sx, sy, sz, -1)
    n = blocks.shape[-1]
    # per-block label histogram via one-hot sum (vectorized bincount)
    counts = (
        blocks[..., None] == np.arange(256, dtype=blocks.dtype)
    ).sum(axis=3)
    zero_count = counts[..., 0] + counts[..., 255]
    empty = zero_count > 0.95 * n
    zero_winner = np.where(counts[..., 0] > counts[..., 255], 0, 255)
    sem = counts[..., 1:255]
    sem_winner = sem.argmax(axis=-1) + 1
    return np.where(empty, zero_winner, sem_winner).astype(np.uint8)


def rle_decode(
    rle: np.ndarray, class_map: np.ndarray, n_voxels: int
) -> np.ndarray:
    """Decode (value, run) RLE pairs with class remap (NYU preprocess)."""
    rle = np.ascontiguousarray(rle, dtype=np.uint32)
    cmap = np.ascontiguousarray(class_map, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.zeros(n_voxels, np.uint8)
        written = lib.rle_decode_u8(rle, rle.size, cmap, cmap.size, out,
                                    n_voxels)
        if written > n_voxels:
            raise ValueError(f"RLE overflow: {written} > {n_voxels}")
        return out
    out = np.zeros(n_voxels, np.uint8)
    idx = 0
    vals = rle[::2]
    runs = rle[1::2]
    for v, r in zip(vals, runs):
        lab = 255 if (v == 255 or v >= cmap.size) else cmap[v]
        out[idx: idx + r] = lab
        idx += int(r)
    return out


def voxel_vote(
    vox_idx: np.ndarray, cls: np.ndarray, grid: Tuple[int, int, int],
    n_classes: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Majority class vote per voxel (tartanair depth2voxel scatter)."""
    vox_idx = np.ascontiguousarray(vox_idx, dtype=np.int32)
    cls = np.ascontiguousarray(cls, dtype=np.int32)
    X, Y, Z = grid
    lib = _load()
    if lib is not None:
        counts = np.empty((X * Y * Z * n_classes,), np.int32)
        binary = np.empty((X, Y, Z), np.uint8)
        vcls = np.empty((X, Y, Z), np.uint8)
        lib.voxel_vote_u8(
            vox_idx.reshape(-1), cls, vox_idx.shape[0], X, Y, Z, n_classes,
            counts, binary.reshape(-1), vcls.reshape(-1),
        )
        return binary, vcls
    binary = np.zeros((X, Y, Z), np.uint8)
    counts = np.zeros((X, Y, Z, n_classes), np.int32)
    ok = (
        (vox_idx[:, 0] >= 0) & (vox_idx[:, 0] < X)
        & (vox_idx[:, 1] >= 0) & (vox_idx[:, 1] < Y)
        & (vox_idx[:, 2] >= 0) & (vox_idx[:, 2] < Z)
    )
    vi = vox_idx[ok]
    ci = cls[ok]
    binary[vi[:, 0], vi[:, 1], vi[:, 2]] = 1
    np.add.at(counts, (vi[:, 0], vi[:, 1], vi[:, 2], ci), 1)
    vcls = np.where(binary > 0, counts.argmax(axis=-1), 0).astype(np.uint8)
    return binary, vcls


def frustum_class_dists(
    px: np.ndarray, py: np.ndarray, pz: np.ndarray, cls: np.ndarray,
    size: int, img_W: int, img_H: int, n_classes: int,
) -> Optional[np.ndarray]:
    """(size^2, n_classes) GT histograms over image tiles, one C++ pass.

    px/py (V, N) int32 pixel coords, pz (V, N) float32 depths, cls (N,)
    int32 labels (255 = ignore).  Returns None when the native library is
    unavailable or V > 8 (caller falls back to the numpy path in
    geometry/frustums_mask.py).
    """
    lib = _load()
    V, N = px.shape
    if lib is None or V > 8:
        return None
    # clip BEFORE the int32 narrowing: extreme projections (z ~ 0+) can
    # exceed int32 and must stay invalid rather than wrap into range;
    # clipping to [-1, dim] preserves the validity predicate exactly
    px = np.ascontiguousarray(np.clip(px, -1, img_W), dtype=np.int32)
    py = np.ascontiguousarray(np.clip(py, -1, img_H), dtype=np.int32)
    pz = np.ascontiguousarray(pz, dtype=np.float32)
    cls = np.ascontiguousarray(cls.reshape(-1), dtype=np.int32)
    out = np.zeros(size * size * n_classes, np.int64)
    try:
        lib.frustum_class_dists_i32(
            px.reshape(-1), py.reshape(-1), pz.reshape(-1), cls, V, N, size,
            img_W, img_H, n_classes, out,
        )
    except AttributeError:  # stale .so without this kernel
        return None
    return out.reshape(size * size, n_classes).astype(np.float64)


def unpack_bits(packed: np.ndarray) -> np.ndarray:
    """1 byte -> 8 voxels, MSB first (io_data.py:10-22)."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(packed.size * 8, np.uint8)
        lib.unpack_bits_u8(packed, packed.size, out)
        return out
    return np.unpackbits(packed)


def pack_bits(bits: np.ndarray) -> np.ndarray:
    bits = np.ascontiguousarray(bits.reshape(-1), dtype=np.uint8)
    lib = _load()
    if lib is not None:
        out = np.empty(bits.size // 8, np.uint8)
        lib.pack_bits_u8(bits, bits.size // 8, out)
        return out
    return np.packbits(bits)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "build":
        print(build(force=True))
