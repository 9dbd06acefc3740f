"""Host-side image augmentation (numpy; no torchvision).

Reference behaviours: ColorJitter(0.4, 0.4, 0.4) + random horizontal flip
with projection-coordinate bookkeeping (kitti_dataset.py:101-121, 367-412),
ImageNet normalization (kitti_dataset.py:164-171).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_rgb(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) float [0, 1] -> ImageNet-normalized float32."""
    return ((img - IMAGENET_MEAN) / IMAGENET_STD).astype(np.float32)


def color_jitter(
    img: np.ndarray,
    rng: np.random.RandomState,
    brightness: float = 0.4,
    contrast: float = 0.4,
    saturation: float = 0.4,
) -> np.ndarray:
    """Random brightness/contrast/saturation like torchvision ColorJitter.

    Applied in a random order with factors ~ U[max(0, 1-f), 1+f].
    """
    ops = []
    if brightness > 0:
        b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(("b", b))
    if contrast > 0:
        c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(("c", c))
    if saturation > 0:
        s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(("s", s))
    rng.shuffle(ops)
    out = img.astype(np.float32)
    for kind, f in ops:
        if kind == "b":
            out = out * f
        elif kind == "c":
            mean = out.mean(axis=(0, 1), keepdims=True).mean()
            gray = 0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
            out = gray.mean() * (1 - f) + out * f
        else:
            gray = (
                0.299 * out[..., 0] + 0.587 * out[..., 1] + 0.114 * out[..., 2]
            )[..., None]
            out = gray * (1 - f) + out * f
    return np.clip(out, 0.0, 1.0)


def ida_matrix(crop: Tuple[int, int, int, int], flip: bool) -> np.ndarray:
    """Image-data-augmentation matrix fed to the frustum generator.

    Encodes crop translation and horizontal flip as a 4x4 affine on
    (u, v, ., 1) (kitti_dataset.py:20-37 img_transform).
    """
    rot = np.eye(2)
    tran = -np.array(crop[:2], np.float64)
    if flip:
        A = np.array([[-1.0, 0.0], [0.0, 1.0]])
        b = np.array([crop[2] - crop[0], 0.0])
        rot = A @ rot
        tran = A @ tran + b
    ida = np.zeros((4, 4))
    ida[3, 3] = 1
    ida[2, 2] = 1
    ida[:2, :2] = rot
    ida[:2, 3] = tran
    return ida.astype(np.float32)


def flip_projected_pix(projected_pix: np.ndarray, img_W: int) -> np.ndarray:
    """Mirror precomputed pattern pixel x-coords after a horizontal flip
    (kitti_dataset.py:384-389)."""
    out = projected_pix.copy()
    out[..., 0] = img_W - 1 - out[..., 0]
    return out
