"""Context-prior relation ground truth (CP mega matrix), vectorized.

Replaces the reference's python triple loop over supervoxels
(occdepth/data/utils/helpers.py:6-91) with broadcasting.  Semantics per
relation channel r, voxel row n (label L_n) and supervoxel column m with the
eight child labels C_m = {c}:

  r=0 "non non same":  exists c != 255 with L_n != 255, c == L_n, c != 0
  r=1 "non non diff":  exists c != 255 with L_n != 255, c != L_n, c != 0, L_n != 0
  r=2 "empty empty":   exists c != 255 with L_n != 255, c == L_n == 0
  r=3 "nonempty empty": exists c != 255 with L_n != 255, c != L_n, (c==0 or L_n==0)

binary mode (n_relations == 2):
  r=0 "diff": exists c != 255 with L_n != 255 and c != L_n
  r=1 "same": exists c != 255 with L_n != 255 and c == L_n
"""
from __future__ import annotations

import numpy as np


def _child_labels(target: np.ndarray) -> np.ndarray:
    """Gather the 8 child labels of each 2x2x2 supervoxel, reference order.

    Reference child order (helpers.py:39-50): (0,0,0) (1,0,0) (0,1,0) (0,0,1)
    (1,1,0) (1,0,1) (0,1,1) (1,1,1).

    Returns (M, 8) with M = prod(shape//2), supervoxels flattened row-major.
    """
    sx, sy, sz = (s // 2 for s in target.shape)
    t = target[: sx * 2, : sy * 2, : sz * 2]
    blocks = t.reshape(sx, 2, sy, 2, sz, 2).transpose(0, 2, 4, 1, 3, 5)
    blocks = blocks.reshape(sx * sy * sz, 2, 2, 2)
    order = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
             (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
    return np.stack([blocks[:, i, j, k] for (i, j, k) in order], axis=1)


def compute_cp_mega_matrix(target: np.ndarray, is_binary: bool = False) -> np.ndarray:
    """Vectorized equivalent of reference compute_CP_mega_matrix.

    Args:
        target: (H, W, D) semantic labels with 255 = invalid.
        is_binary: 2-relation variant (n_relations == 2 configs).

    Returns:
        (n_rel, N, M) uint8 with N = H*W*D, M = prod(dims//2).
    """
    label_row = target.reshape(-1)  # (N,)
    children = _child_labels(target)  # (M, 8)

    row = label_row[:, None, None]  # (N, 1, 1)
    col = children[None, :, :]  # (1, M, 8)
    row_valid = row != 255
    col_valid = col != 255

    if is_binary:
        diff = (row_valid & col_valid & (col != row)).any(axis=2)
        same = (row_valid & col_valid & (col == row)).any(axis=2)
        matrix = np.stack([diff, same])
    else:
        r0 = (row_valid & col_valid & (col == row) & (col != 0)).any(axis=2)
        r1 = (
            row_valid & col_valid & (col != row) & (col != 0) & (row != 0)
        ).any(axis=2)
        r2 = (row_valid & col_valid & (row == col) & (col == 0)).any(axis=2)
        r3 = (
            row_valid & col_valid & (row != col) & ((row == 0) | (col == 0))
        ).any(axis=2)
        matrix = np.stack([r0, r1, r2, r3])
    return matrix.astype(np.uint8)
